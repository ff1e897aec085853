"""End-to-end keyframe SLAM + VO smoke on the real TPU.

Runs the same scenarios as tests/test_slam_real_frontend.py and
tests/test_vo_real_frontend.py (which the test harness pins to CPU) on the
default backend -- the tunneled TPU chip -- exercising the Pallas fast
paths inside the full mapping stack: fused frontend, window gather, fused
ORB select, fused Hamming match reductions, triangulation, windowed
Schur-complement BA, ATE evaluation. First run compiles for ~10 min
through the tunnel; the persistent cache makes re-runs fast.
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import jax  # noqa: E402

from pislam_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    print("backend:", jax.default_backend())
    import test_slam_real_frontend as ts
    t0 = time.time()
    ts.test_keyframe_slam_real_frontend()
    print(f"keyframe SLAM end-to-end: PASS ({time.time() - t0:.1f}s)")
    import test_vo_real_frontend as tv
    t0 = time.time()
    tv.test_vo_straight_line()
    print(f"visual odometry: PASS ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
