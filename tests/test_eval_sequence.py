"""The committed evaluation sequence: loop closure must fire and help.

data/eval_seq.npz is a 48-frame out-and-back loop rendered by
tools/make_eval_sequence.py (deterministic); tools/eval_ate.py publishes the
README ATE numbers from it. This test pins the behaviours those numbers rest
on: the artifact is intact, keyframe SLAM tracks it, the final view closes
the loop against an early keyframe, and the pose-graph correction moves the
keyframe trajectory towards ground truth (the reference has no trajectory
layer at all -- frontend-only, README.md:22).
"""

import os
import sys

import numpy as np
import jax.numpy as jnp

from pislam_tpu.evaluation import ate_rmse
from pislam_tpu.models.slam import KeyframeSLAM

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "eval_seq.npz")


def test_committed_sequence_slam_with_loop_closure():
    from eval_ate import slam_config

    d = np.load(DATA)
    frames, Rs, ts = d["frames"], d["Rs"], d["ts"]
    assert frames.shape == (48, 256, 384) and frames.dtype == np.uint8
    gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    # the sequence is a loop: it ends where it started
    assert np.linalg.norm(gt[-1] - gt[0]) < 1e-6

    cfg = slam_config(384, 256)
    slam = KeyframeSLAM(cfg, float(d["fx"]), float(d["fy"]),
                        float(d["cx"]), float(d["cy"]),
                        keyframe_min_inliers=60, keyframe_max_gap=3)
    for f in frames:
        slam.process(jnp.asarray(f))
    assert len(slam.keyframes) >= 10
    assert slam.num_landmarks > 500

    gtk = gt[np.asarray(slam.keyframe_frames)]
    pre = ate_rmse(slam.keyframe_positions(), gtk, with_scale=True)
    loop = slam.try_close_loop(min_matches=40, exclude_recent=3)
    post = ate_rmse(slam.keyframe_positions(), gtk, with_scale=True)

    # the returning camera must close against one of the first keyframes
    assert 0 <= loop <= 2, f"loop closed to ordinal {loop}"
    # and the pose-graph correction must reduce keyframe ATE
    assert post < pre, (pre, post)
    # gate_radius=0.06 map matching: post-closure ATE ~0.045 on this
    # sequence (was ~0.145 ungated); pin well under the ungated figure
    assert post < 0.10, f"post-closure keyframe ATE {post:.4f}"
    # (recorded: pre ~0.189, post ~0.145 on a 3.16 m path)


def test_sequence_regenerates_identically():
    """make_eval_sequence is deterministic: the committed artifact is
    reproducible (auditable) from the generator."""
    from make_eval_sequence import FX, FY, H, W, trajectory
    from pislam_tpu.utils.render import PlaneScene

    d = np.load(DATA)
    scene = PlaneScene(width=W, height=H, fx=FX, fy=FY, seed=21)
    rolls, sxs, dzs = trajectory()
    # spot-check three frames (full regeneration is slow on CI)
    for i in (0, 17, 47):
        f, R, t = scene.render_trajectory([rolls[i]], [sxs[i]], [dzs[i]])
        assert np.array_equal(f[0], d["frames"][i])
        np.testing.assert_array_equal(R[0], d["Rs"][i])
        np.testing.assert_array_equal(t[0], d["ts"][i])


DATA2 = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "eval_seq2.npz")


def test_held_out_sequence_slam():
    """The HELD-OUT sequence (different scene, two-lobe sweep, stronger
    roll, deeper dolly): the evaluation config -- including the gate radius
    tuned on eval_seq -- must generalise, and the full closure pipeline
    (pose graph + global BA + cull, as the service runs it) must never
    leave the map worse than before closure."""
    from eval_ate import slam_config

    d = np.load(DATA2)
    frames, Rs, ts = d["frames"], d["Rs"], d["ts"]
    assert frames.shape == (56, 256, 384) and frames.dtype == np.uint8
    gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    assert np.linalg.norm(gt[-1] - gt[0]) < 1e-6

    cfg = slam_config(384, 256)
    slam = KeyframeSLAM(cfg, float(d["fx"]), float(d["fy"]),
                        float(d["cx"]), float(d["cy"]),
                        keyframe_min_inliers=60, keyframe_max_gap=3)
    for f in frames:
        slam.process(jnp.asarray(f))
    assert len(slam.keyframes) >= 12
    assert slam.num_landmarks > 500

    gtk = gt[np.asarray(slam.keyframe_frames)]
    pre = ate_rmse(slam.keyframe_positions(), gtk, with_scale=True)
    loop = slam.try_close_loop(min_matches=40, exclude_recent=3)
    assert 0 <= loop <= 2, f"loop closed to ordinal {loop}"
    if loop >= 0:
        slam.global_ba()
        slam.cull_landmarks()
    post = ate_rmse(slam.keyframe_positions(), gtk, with_scale=True)

    # generalisation pins (recorded: pre ~0.154, post-graph ~0.196,
    # post-global-BA ~0.155 on a 5.33 m path; ungated pre was ~0.209)
    assert pre < 0.25, f"pre-closure keyframe ATE {pre:.4f}"
    assert post < pre + 0.02, (pre, post)


def test_sequence2_regenerates_identically():
    from make_eval_sequence import FX, FY, H, W, trajectory_b
    from pislam_tpu.utils.render import PlaneScene

    d = np.load(DATA2)
    scene = PlaneScene(width=W, height=H, fx=FX, fy=FY, seed=5)
    rolls, sxs, dzs = trajectory_b()
    for i in (0, 23, 55):
        f, R, t = scene.render_trajectory([rolls[i]], [sxs[i]], [dzs[i]])
        assert np.array_equal(f[0], d["frames"][i])
        np.testing.assert_array_equal(R[0], d["Rs"][i])
        np.testing.assert_array_equal(t[0], d["ts"][i])
