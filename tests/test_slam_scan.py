"""Device-resident SLAM tracking scan vs the host-driven per-frame loop.

chunk size 1 must reproduce KeyframeSLAM.process exactly (same keyframe
decisions, same counters, trajectories to float tolerance -- the scan
compiles one fused program, so bitwise equality across jit boundaries is
not guaranteed). Larger chunks defer window BA to chunk boundaries; the
accuracy cost on the committed sequence must stay small.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from pislam_tpu.evaluation import ate_rmse
from pislam_tpu.models.slam import KeyframeSLAM

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "eval_seq.npz")


def _load(n):
    from eval_ate import slam_config

    d = np.load(DATA)
    intr = (float(d["fx"]), float(d["fy"]), float(d["cx"]), float(d["cy"]))
    gt = np.stack([-R.T @ t for R, t in zip(d["Rs"], d["ts"])])[:n]
    return slam_config(384, 256), d["frames"][:n], intr, gt


def _make(cfg, intr, seed=7):
    return KeyframeSLAM(cfg, *intr, keyframe_min_inliers=60,
                        keyframe_max_gap=3, seed=seed)


def test_chunk1_matches_loop():
    cfg, frames, intr, _ = _load(10)

    loop = _make(cfg, intr)
    infos = [loop.process(jnp.asarray(f)) for f in frames]

    scan = _make(cfg, intr)
    outs = [scan.process_chunk(f[None]) for f in frames]

    for i, (info, out) in enumerate(zip(infos, outs)):
        assert bool(out["keyframe"][0]) == bool(info["keyframe"]), i
        assert int(out["num_inliers"][0]) == int(info["num_inliers"]), i
        assert abs(int(out["map_inliers"][0]) - int(info["map_inliers"])) \
            <= 2, i
    assert scan.num_keyframes == loop.num_keyframes
    assert scan.keyframe_frames == loop.keyframe_frames
    assert scan.num_landmarks == loop.num_landmarks
    np.testing.assert_allclose(np.stack(scan.trajectory),
                               np.stack(loop.trajectory), atol=1e-3)


def test_chunked_tracking_accuracy():
    """Chunks of 8 (BA at chunk boundaries): ATE stays close to the loop."""
    cfg, frames, intr, gt = _load(24)

    loop = _make(cfg, intr)
    for f in frames:
        loop.process(jnp.asarray(f))
    ate_loop = ate_rmse(np.stack(loop.trajectory), gt)

    scan = _make(cfg, intr)
    for i in range(0, len(frames), 8):
        out = scan.process_chunk(frames[i: i + 8])
        assert out["pose_R"].shape[0] == min(8, len(frames) - i)
    assert len(scan.trajectory) == len(frames)
    ate_scan = ate_rmse(np.stack(scan.trajectory), gt)
    # deferred BA may cost a little accuracy but must stay in family
    assert ate_scan < max(2.5 * ate_loop, 0.15), (ate_loop, ate_scan)


def test_process_chunk_rejects_injected_frontend():
    cfg, _frames, intr, _ = _load(2)
    slam = KeyframeSLAM(cfg, *intr, features_fn=lambda i: None)
    with pytest.raises(ValueError):
        slam.process_chunk(np.zeros((1, 256, 384), np.uint8))
