"""Aux subsystems: datasets, checkpointing, evaluation metrics, profiling."""

import os

import numpy as np
import pytest

from pislam_tpu.evaluation import ate_rmse, rpe_rmse, umeyama_align
from pislam_tpu.io import datasets, native
from pislam_tpu.utils import checkpoint


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    gt = rng.normal(0, 2, (50, 3))
    from pislam_tpu.geometry import se3
    import jax.numpy as jnp
    R = np.asarray(se3.so3_exp(jnp.asarray(np.float32([0.3, -0.2, 0.5]))))
    est = ((gt - [1, 2, 3]) @ R) / 2.5  # inverse similarity
    s, Rr, t = umeyama_align(est, gt)
    assert abs(s - 2.5) < 1e-3
    assert ate_rmse(est, gt) < 1e-5
    assert rpe_rmse(est, gt) < 1e-4


def test_ate_nonzero_for_bad_traj():
    rng = np.random.default_rng(1)
    gt = np.cumsum(rng.normal(0, 0.1, (100, 3)), 0)
    est = gt + rng.normal(0, 0.5, (100, 3))
    assert ate_rmse(est, gt) > 0.1


def test_image_dir_dataset(tmp_path):
    rng = np.random.default_rng(2)
    for i in range(5):
        native.write_png(str(tmp_path / f"{i:04d}.png"),
                         rng.integers(0, 255, (24, 32), np.uint8))
    stream = datasets.image_dir(str(tmp_path))
    frames = list(stream)
    assert len(frames) == 5 and frames[0].shape == (24, 32)


def test_tum_dataset(tmp_path):
    (tmp_path / "rgb").mkdir()
    rgb_lines = ["# comment"]
    for i in range(4):
        native.write_png(str(tmp_path / "rgb" / f"{i}.png"),
                         np.zeros((8, 8), np.uint8))
        rgb_lines.append(f"{100.0 + i * 0.1:.4f} rgb/{i}.png")
    (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines))
    gt_lines = ["# gt"]
    for i in range(8):
        t = 100.0 + i * 0.05
        gt_lines.append(f"{t:.4f} {i * 0.1} 0 0 0 0 0 1")
    (tmp_path / "groundtruth.txt").write_text("\n".join(gt_lines))

    paths, ts, gt = datasets.tum_dataset(str(tmp_path))
    assert len(paths) == 4 and gt.shape == (4, 3)
    assert gt[1, 0] > gt[0, 0]


def test_kitti_poses(tmp_path):
    poses = np.hstack([np.tile(np.eye(3).reshape(-1), (3, 1)),
                       np.arange(9).reshape(3, 3)])
    # KITTI row-major 3x4: interleave correctly
    rows = []
    for i in range(3):
        m = np.hstack([np.eye(3), np.full((3, 1), i, float)])
        rows.append(m.reshape(-1))
    f = tmp_path / "00.txt"
    np.savetxt(f, np.stack(rows))
    pos = datasets.load_kitti_poses(str(f))
    np.testing.assert_allclose(pos[:, 0], [0, 1, 2])


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from pislam_tpu.backend import keyframes

    store = keyframes.empty_store(capacity=4, max_kp=16, words=8)
    store = store._replace(frame_id=store.frame_id.at[0].set(42),
                           valid=store.valid.at[0].set(True))
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, store._asdict())
    back = checkpoint.restore(path)
    assert int(back["frame_id"][0]) == 42
    assert bool(back["valid"][0])
    np.testing.assert_array_equal(np.asarray(back["codes"]),
                                  np.asarray(store.codes))
