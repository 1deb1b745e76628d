from moptimizer_0_tpu.utils.stopwatch import Stopwatch, time_jitted
from moptimizer_0_tpu.utils.logging import Logger, format_trace
from moptimizer_0_tpu.utils.pointcloud import load_txt_cloud
