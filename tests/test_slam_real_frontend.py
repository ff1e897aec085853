"""Keyframe SLAM driven by the REAL image frontend.

Same rendered two-depth scene as test_vo_real_frontend (textured planes,
integer per-frame shifts, constant lateral camera speed) but a longer run
with a small keyframe gap, so the full mapping stack executes: keyframe
promotion, two-view triangulation, sliding-window Schur-complement BA, and
trajectory bookkeeping. Asserts keyframes and landmarks were actually
created and the trajectory matches ground truth after scale alignment.
"""

import numpy as np
import jax.numpy as jnp

from pislam_tpu.config import (BAConfig, FrontendConfig, MatcherConfig,
                               PislamConfig, PyramidConfig, VOConfig)
from pislam_tpu.evaluation import ate_rmse
from pislam_tpu.models.slam import KeyframeSLAM

from test_vo_real_frontend import (CX, CY, FX, FY, H, TX, W, _texture)

N_FRAMES = 14


def render_frames(n):
    bg = _texture(H, W + 2 * n * 2, seed=1)
    fg = _texture(H // 2, W + 4 * n * 2, seed=2)
    frames = []
    for i in range(n):
        f = bg[:, 2 * i: 2 * i + W].copy()
        f[H // 4: H // 4 + H // 2] = fg[:, 4 * i: 4 * i + W]
        frames.append(f)
    return np.stack(frames)


def test_keyframe_slam_real_frontend():
    cfg = PislamConfig(
        pyramid=PyramidConfig(base_width=W, base_height=H, num_levels=4),
        frontend=FrontendConfig(fast_threshold=20, harris_threshold=1 << 10,
                                border=16, max_keypoints=512),
        matcher=MatcherConfig(max_distance=48, ratio=0.85),
        vo=VOConfig(ransac_iters=192, inlier_threshold=2e-3, min_inliers=20),
        ba=BAConfig(window=6, max_points=1024, max_obs=4096, gn_iters=4),
    )
    slam = KeyframeSLAM(cfg, FX, FY, CX, CY,
                        keyframe_min_inliers=10_000,  # force gap-based KFs
                        keyframe_max_gap=4)
    frames = render_frames(N_FRAMES)
    infos = [slam.process(jnp.asarray(f)) for f in frames]

    assert len(slam.keyframes) >= 3, f"only {len(slam.keyframes)} keyframes"
    X = slam.landmark_positions()
    n_pts = len(X)
    assert n_pts >= 50, f"only {n_pts} landmarks"
    assert sum(i["num_inliers"] >= 20 for i in infos[1:]) >= N_FRAMES - 3

    est = np.stack(slam.trajectory)
    gt = np.stack([np.array([TX * i, 0.0, 0.0]) for i in range(N_FRAMES)])
    ate = ate_rmse(est, gt, with_scale=True)
    assert ate < 0.08, f"ATE {ate:.4f}\n{est}"

    # triangulated landmark depths must cluster at the two plane depths
    # (up to the monocular scale factor shared with the trajectory)
    z = X[:, 2]
    z = z[(z > 0) & np.isfinite(z)]
    assert len(z) >= 40
    # scale: unit step per frame vs TX true step
    scale = 1.0 / TX
    near = np.abs(z - 4.0 * scale) < 0.8 * scale
    far = np.abs(z - 8.0 * scale) < 1.6 * scale
    assert (near | far).mean() > 0.7, (
        f"landmark depths off: median z={np.median(z):.2f}, "
        f"expected ~{4*scale:.1f} or ~{8*scale:.1f}")
