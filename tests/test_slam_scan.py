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


def _load(n, huber=None):
    import dataclasses as dc

    from eval_ate import slam_config

    d = np.load(DATA)
    intr = (float(d["fx"]), float(d["fy"]), float(d["cx"]), float(d["cy"]))
    gt = np.stack([-R.T @ t for R, t in zip(d["Rs"], d["ts"])])[:n]
    cfg = slam_config(384, 256)
    if huber is not None:
        # the DECISION-parity tests run with the robust kernel off: the
        # scan mirror is exactly decision-identical to the host loop
        # (measured: zero mismatches, map-inlier deltas 0 over the first
        # 10 frames), but Huber LM's accept/reject branches amplify
        # cross-jit float noise into different accepted maps (same run,
        # huber=6e-3: inlier deltas up to 115, decisions flip near the
        # min_map_inliers threshold) -- program-partition noise, not a
        # logic divergence. Production-config behaviour is covered by
        # test_chunked_tracking_accuracy and tools/ab_chunk_accuracy.py.
        cfg = dc.replace(cfg, ba=dc.replace(cfg.ba, huber=huber))
    return cfg, d["frames"][:n], intr, gt


def _make(cfg, intr, seed=7):
    return KeyframeSLAM(cfg, *intr, keyframe_min_inliers=60,
                        keyframe_max_gap=3, seed=seed)


def test_chunk1_matches_loop():
    cfg, frames, intr, _ = _load(10, huber=0.0)

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
    # decisions are exact (above); positions only to float tolerance: the
    # scan compiles one fused program, so map-PnP inlier sets can differ
    # by one near the threshold (measured 33 vs 34 on the real-texture
    # sequence) and the iterative motion-only BA amplifies that to ~2e-2
    # MAP units (~2 mm at the map's ~10x metric scale)
    np.testing.assert_allclose(np.stack(scan.trajectory),
                               np.stack(loop.trajectory), atol=5e-2)


def test_chunk1_matches_loop_step_prior():
    """The step-magnitude-prior fallback (vo.step_magnitude_prior, default
    off) is mirrored in the host loop and the device scan; with it ON the
    two must still make identical decisions and near-identical poses."""
    import dataclasses as dc

    cfg, frames, intr, _ = _load(12, huber=0.0)
    # min_kf=2: the production maturity gate (4) admits no fallback in the
    # first 12 frames of eval_seq; this test checks DECISION PARITY of the
    # mirrored fallback code, so let it fire during bootstrap here
    cfg = dc.replace(cfg, vo=dc.replace(cfg.vo, step_magnitude_prior=True,
                                        step_prior_min_kf=2))

    from pislam_tpu.utils.metrics import Metrics

    m = Metrics()
    loop = KeyframeSLAM(cfg, *intr, keyframe_min_inliers=60,
                        keyframe_max_gap=3, seed=7, metrics=m)
    infos = [loop.process(jnp.asarray(f)) for f in frames]
    # the fallback must actually fire or this parity test tests nothing
    assert m._counters.get("step_prior_fallbacks", 0) > 0

    scan = _make(cfg, intr)
    outs = [scan.process_chunk(f[None]) for f in frames]

    for i, (info, out) in enumerate(zip(infos, outs)):
        assert bool(out["keyframe"][0]) == bool(info["keyframe"]), i
        assert int(out["num_inliers"][0]) == int(info["num_inliers"]), i
    assert scan.keyframe_frames == loop.keyframe_frames
    # looser than the base parity test: the fallback normalises the step
    # vector (step/|step|), which amplifies cross-jit float noise when the
    # candidate step is short; measured drift over 6 consecutive fallback
    # frames is ~0.11 map units with IDENTICAL decisions throughout
    np.testing.assert_allclose(np.stack(scan.trajectory),
                               np.stack(loop.trajectory), atol=0.2)


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


def test_chunk_boundary_lost_recovery():
    """Chunk-mode kidnapped robot: when a chunk ends LOST the host
    relocalises the last frame against the whole store and promotes it to
    a recovery keyframe; the next chunk tracks against it. A camera pans
    across a wide texture (consecutive windows overlap -> keyframes); the
    kidnap revisits the START of the pan, which shares nothing with the
    last keyframe but everything with the first."""
    rng = np.random.default_rng(3)
    h, w = 256, 384
    step = 64
    pan = rng.integers(0, 256, (h, w + 10 * step), np.uint8)

    def window(off):
        return np.ascontiguousarray(pan[:, off: off + w])

    cfg, _frames, intr, _ = _load(2)
    # every tracked frame becomes a keyframe (gap 1)
    slam = KeyframeSLAM(cfg, *intr, keyframe_min_inliers=10**6,
                        keyframe_max_gap=1, seed=7)

    for i in range(11):
        out = slam.process_chunk(window(i * step)[None])
        assert bool(out["keyframe"][0]), i
    assert slam.num_keyframes == 11
    kf_before = slam.num_keyframes

    # kidnap back to the start of the pan (+2px so it is not bit-identical
    # to keyframe 0): no overlap with the last keyframe (offset 640) ->
    # LOST on device; the chunk-boundary recovery relocalises against
    # keyframe 0 and inserts a recovery keyframe
    out = slam.process_chunk(window(2)[None])
    assert slam.frames_lost >= 1
    assert slam.relocalisations == 1
    assert slam.num_keyframes == kf_before + 1
    assert bool(out["keyframe"][0])

    # the next chunk tracks against the recovery keyframe
    out = slam.process_chunk(window(6)[None])
    assert int(out["num_inliers"][0]) >= cfg.vo.min_inliers

    # a pure-noise blackout chunk stays lost WITHOUT inserting anything
    kf_now = slam.num_keyframes
    blackout = rng.integers(0, 256, (h, w), np.uint8)
    out = slam.process_chunk(blackout[None])
    assert not bool(out["keyframe"][0])
    assert slam.num_keyframes == kf_now
