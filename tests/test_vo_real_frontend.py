"""End-to-end VO with the REAL image frontend on a rendered scene.

A camera translates laterally at constant speed past two fronto-parallel
textured planes at different depths (depth variation keeps the essential
matrix well-conditioned; integer per-frame pixel shifts make the rendering
exact). The full production path runs: on-device pyramid build, ORB
extraction, Hamming matching, RANSAC essential + cheirality, pose chaining.
The recovered trajectory must be a straight line matching ground truth after
monocular scale alignment.
"""

import numpy as np
import jax.numpy as jnp

from pislam_tpu.config import (FrontendConfig, MatcherConfig, PislamConfig,
                               PyramidConfig, VOConfig)
from pislam_tpu.evaluation import ate_rmse
from pislam_tpu.models.visual_odometry import VisualOdometry

W, H = 384, 256
FX = FY = 256.0
CX, CY = W / 2.0, H / 2.0
Z_BG, Z_FG = 8.0, 4.0
# lateral speed chosen so both plane shifts are integers:
# bg shift = FX * TX / Z_BG = 2 px, fg shift = 4 px per frame
TX = 1.0 / 16.0
N_FRAMES = 8


def _texture(h, w, seed):
    """Blocky random texture: strong corners at many scales."""
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 256, (h // 8, w // 8), np.uint8)
    t = np.kron(t, np.ones((8, 8), np.uint8))
    t2 = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    t2 = np.kron(t2, np.ones((2, 2), np.uint8))
    return ((t.astype(np.int32) + t2.astype(np.int32)) // 2).astype(np.uint8)


def render_frames():
    bg = _texture(H, W + 2 * N_FRAMES * 2, seed=1)
    fg = _texture(H // 2, W + 4 * N_FRAMES * 2, seed=2)
    frames = []
    for i in range(N_FRAMES):
        f = bg[:, 2 * i: 2 * i + W].copy()
        # foreground band occupies the middle rows
        f[H // 4: H // 4 + H // 2] = fg[:, 4 * i: 4 * i + W]
        frames.append(f)
    return np.stack(frames)


def test_vo_straight_line():
    cfg = PislamConfig(
        pyramid=PyramidConfig(base_width=W, base_height=H, num_levels=4),
        frontend=FrontendConfig(fast_threshold=20, harris_threshold=1 << 10,
                                border=16, max_keypoints=512),
        matcher=MatcherConfig(max_distance=48, ratio=0.85),
        vo=VOConfig(ransac_iters=192, inlier_threshold=2e-3, min_inliers=20),
    )
    vo = VisualOdometry(cfg, FX, FY, CX, CY)
    frames = render_frames()

    state = vo.init(jnp.asarray(frames[0]), seed=0)
    positions = [vo.camera_position(state)]
    accepted = 0
    for i in range(1, N_FRAMES):
        state, info = vo.process(state, jnp.asarray(frames[i]))
        accepted += int(info["accepted"])
        positions.append(vo.camera_position(state))
    est = np.stack(positions)

    assert accepted >= N_FRAMES - 2, f"only {accepted} accepted VO steps"

    # ground truth: camera centers on a straight +x line, constant speed
    gt = np.stack([np.array([TX * i, 0.0, 0.0]) for i in range(N_FRAMES)])
    ate = ate_rmse(est, gt, with_scale=True)
    # unit-norm monocular steps on a constant-speed line align exactly up to
    # matching/RANSAC noise; require cm-level agreement on a 0.44 m path
    assert ate < 0.05, f"ATE {ate:.4f} too large\nest:\n{est}"
