"""Point-cloud IO.

Reads the whitespace `x y z r g b` text format of the reference's LiDAR
fixture (loader at reference tst/point2point.cpp:125-138). Uses the native
C++ fast parser (moptimizer_0_tpu.native) when built, falling back to numpy.
"""

import numpy as np


def load_txt_cloud(path, dtype=np.float64):
    """Load an `x y z [extra...]` text cloud → (N, 3) array."""
    try:
        from moptimizer_0_tpu.native import load_txt_cloud_native

        pts = load_txt_cloud_native(str(path))
        return np.asarray(pts, dtype=dtype)
    except Exception:
        data = np.loadtxt(str(path), dtype=dtype)
        return np.ascontiguousarray(data[:, :3])
