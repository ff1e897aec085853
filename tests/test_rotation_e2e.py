"""End-to-end VO/SLAM on sequences that ROTATE the camera.

Round-1 e2e tests used pure lateral integer-pixel translation, so the angle
bins were near-constant across frames and rotated-BRIEF invariance (the
entire point of ORB, reference Brief.h:28-53, Orb.h:310-387) was never
exercised in the matching/VO loop. These sequences roll the camera in-plane
through 42 degrees (3.5 angle bins of 12 degrees) and drive forward motion;
they fail if atan2 binning or the rotation-select descriptor path breaks
(verified: zeroing the angle bins makes the rotation sequence lose nearly
all matches).

Rendering: pislam_tpu.utils.render.PlaneScene -- two fronto-parallel
textured planes (depth variation keeps the essential matrix
well-conditioned) sampled by inverse bilinear mapping.
"""

import numpy as np
import jax.numpy as jnp

from pislam_tpu.config import (BAConfig, FrontendConfig, MatcherConfig,
                               PislamConfig, PyramidConfig, VOConfig)
from pislam_tpu.evaluation import ate_rmse
from pislam_tpu.models.slam import KeyframeSLAM
from pislam_tpu.models.visual_odometry import VisualOdometry
from pislam_tpu.utils.render import PlaneScene

W, H = 384, 256
FX = FY = 256.0
CX, CY = W / 2.0, H / 2.0


def render_sequence(n, roll_step_deg=0.0, lateral_step=0.0, forward_step=0.0,
                    seed=0):
    """Render n frames + ground-truth (Rs, ts) on a linear trajectory:
    roll i*roll_step_deg, lateral i*lateral_step, forward i*forward_step."""
    scene = PlaneScene(width=W, height=H, fx=FX, fy=FY, seed=seed)
    i = np.arange(n)
    frames, Rs, ts = scene.render_trajectory(
        np.deg2rad(roll_step_deg * i), lateral_step * i, forward_step * i)
    return frames, list(Rs), list(ts)


def _cfg():
    return PislamConfig(
        pyramid=PyramidConfig(base_width=W, base_height=H, num_levels=4),
        frontend=FrontendConfig(fast_threshold=20, harris_threshold=1 << 10,
                                border=16, max_keypoints=512),
        matcher=MatcherConfig(max_distance=64, ratio=0.85),
        vo=VOConfig(ransac_iters=256, inlier_threshold=2e-3, min_inliers=20),
        ba=BAConfig(window=6, max_points=1024, max_obs=4096, gn_iters=4),
    )


def _run_vo(frames):
    vo = VisualOdometry(_cfg(), FX, FY, CX, CY)
    state = vo.init(jnp.asarray(frames[0]), seed=0)
    positions = [vo.camera_position(state)]
    accepted = 0
    infos = []
    for i in range(1, len(frames)):
        state, info = vo.process(state, jnp.asarray(frames[i]))
        accepted += int(info["accepted"])
        infos.append(info)
        positions.append(vo.camera_position(state))
    return state, np.stack(positions), accepted, infos


def test_rotation_invariance_is_load_bearing():
    """Matching frames 36 degrees of roll apart (3 angle bins) works ONLY
    because of the orientation machinery: the same descriptors recomputed
    with zeroed angle bins match nothing. This is the differential that
    fails if atan2 binning or the rotation-select path breaks."""
    from pislam_tpu.frontend import make_extract_fn
    from pislam_tpu.ops import brief, patches, pyramid as pyr_ops
    from pislam_tpu import matching
    import jax

    frames, _, _ = render_sequence(8, roll_step_deg=6.0, lateral_step=1 / 8)
    cfg = _cfg()
    extract = make_extract_fn(cfg)
    build = jax.jit(lambda f: pyr_ops.build_pyramid(f, cfg.pyramid))

    def feats_and_unrotated(i):
        pyr = build(jnp.asarray(frames[i]))
        f = extract(pyr)
        flat = patches.gather_patches_packed_s8(pyr, f.xs, f.ys, f.valid)
        d0 = brief.describe_packed(flat, jnp.zeros_like(f.angles),
                                   cfg.frontend.words)
        return f, jnp.where(f.valid[:, None], d0, jnp.uint32(0))

    f0, z0 = feats_and_unrotated(0)
    f6, z6 = feats_and_unrotated(6)  # 36 degrees of roll later
    mc = cfg.matcher
    idx, _ = matching.match(f0.descriptors, f6.descriptors, f0.valid,
                            f6.valid, max_distance=mc.max_distance,
                            ratio=mc.ratio)
    n_rot = int((np.asarray(idx) >= 0).sum())
    idx0, _ = matching.match(z0, z6, f0.valid, f6.valid,
                             max_distance=mc.max_distance, ratio=mc.ratio)
    n_norot = int((np.asarray(idx0) >= 0).sum())
    assert n_rot >= 50, f"only {n_rot} rotated-BRIEF matches across 36 deg"
    assert n_norot <= n_rot // 5, (n_rot, n_norot)
    # (measured: 76 vs 0)


def test_vo_inplane_rotation():
    """42-degree total roll + lateral motion: matching must survive across
    angle bins and the recovered poses must track both the rotation and the
    straight-line trajectory."""
    n = 8
    frames, Rs, ts = render_sequence(n, roll_step_deg=6.0, lateral_step=1 / 8)
    state, est, accepted, infos = _run_vo(frames)
    assert accepted >= n - 2, f"only {accepted} accepted VO steps"
    # rotation: final estimate within a few degrees of the 42-degree roll
    R_est = np.asarray(state.R)
    dR = R_est @ Rs[-1].T
    ang = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 6.0, f"rotation error {ang:.2f} deg"  # ~0.8 deg/step drift
    gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    ate = ate_rmse(est, gt, with_scale=True)
    assert ate < 0.10, f"ATE {ate:.4f}\n{est}"  # ~0.9 m path, 11%


def test_vo_forward_motion():
    """Dolly towards the planes: looming scale change, depth parallax."""
    n = 8
    frames, Rs, ts = render_sequence(n, forward_step=0.22, seed=3)
    state, est, accepted, infos = _run_vo(frames)
    assert accepted >= n - 2, f"only {accepted} accepted VO steps"
    gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    ate = ate_rmse(est, gt, with_scale=True)
    assert ate < 0.12, f"ATE {ate:.4f}\n{est}"
    # the recovered direction must be dominantly forward
    d = est[-1] - est[0]
    assert abs(d[2]) > 3 * np.hypot(d[0], d[1]), est


def test_slam_rotation_sequence():
    """Keyframe SLAM (map tracking + BA) through the rolling sequence."""
    n = 12
    frames, Rs, ts = render_sequence(n, roll_step_deg=5.0, lateral_step=1 / 8,
                                     seed=5)
    slam = KeyframeSLAM(_cfg(), FX, FY, CX, CY,
                        keyframe_min_inliers=10_000,  # force gap-based KFs
                        keyframe_max_gap=3)
    infos = [slam.process(jnp.asarray(f)) for f in frames]
    assert len(slam.keyframes) >= 3
    assert sum(i["num_inliers"] >= 20 for i in infos[1:]) >= n - 3, \
        [i["num_inliers"] for i in infos]
    est = np.stack(slam.trajectory)
    gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    ate = ate_rmse(est, gt, with_scale=True)
    assert ate < 0.12, f"ATE {ate:.4f}\n{est}"
    # keyframe rotations must follow the roll
    for v in slam.keyframes[1:]:
        i = v.frame
        dR = v.R @ Rs[i].T
        ang = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 10.0, f"keyframe {i}: rotation error {ang:.1f} deg"
