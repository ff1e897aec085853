"""Motion-only BA (backend/pnp.py): pose recovery, robustness, degeneracy.

Covered elsewhere only through the SLAM map-tracking path; these pin the
solver itself (reference has no PnP at all, README.md:22)."""

import numpy as np
import jax.numpy as jnp

from pislam_tpu.backend.pnp import motion_only_ba
from pislam_tpu.geometry import se3


def scene(n=120, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform([-3, -2, 3], [3, 2, 9], (n, 3)).astype(np.float32)
    w = np.float32([0.04, -0.06, 0.03])
    R = np.asarray(se3.so3_exp(jnp.asarray(w))).astype(np.float32)
    t = np.float32([0.12, -0.05, 0.08])
    xc = xyz @ R.T + t
    uv = (xc[:, :2] / xc[:, 2:]).astype(np.float32)
    return xyz, uv, R, t, rng


def perturbed(R, t, rng, rot=0.03, trans=0.05):
    dw = rng.normal(0, rot, 3).astype(np.float32)
    dR = np.asarray(se3.so3_exp(jnp.asarray(dw))).astype(np.float32)
    return dR @ R, (dR @ t + rng.normal(0, trans, 3)).astype(np.float32)


def test_exact_recovery():
    xyz, uv, R, t, rng = scene()
    R0, t0 = perturbed(R, t, rng)
    out = motion_only_ba(jnp.asarray(R0), jnp.asarray(t0),
                         jnp.asarray(xyz), jnp.asarray(uv),
                         jnp.ones(len(xyz), bool))
    assert np.linalg.norm(np.asarray(out["R"]) - R) < 1e-3
    assert np.linalg.norm(np.asarray(out["t"]) - t) < 1e-3
    assert int(out["num_inliers"]) == len(xyz)


def test_outlier_robustness():
    """25% gross outliers: Huber re-weighting must keep the pose accurate
    and classify the outliers out."""
    xyz, uv, R, t, rng = scene(seed=1)
    n = len(xyz)
    bad = rng.permutation(n)[: n // 4]
    uv = uv.copy()
    uv[bad] += rng.uniform(0.05, 0.3, (len(bad), 2)) * \
        rng.choice([-1, 1], (len(bad), 2))
    R0, t0 = perturbed(R, t, rng)
    out = motion_only_ba(jnp.asarray(R0), jnp.asarray(t0),
                         jnp.asarray(xyz), jnp.asarray(uv),
                         jnp.ones(n, bool))
    assert np.linalg.norm(np.asarray(out["R"]) - R) < 5e-3
    assert np.linalg.norm(np.asarray(out["t"]) - t) < 1e-2
    inl = np.asarray(out["inliers"])
    assert not inl[bad].any()
    assert inl.sum() == n - len(bad)


def test_behind_camera_and_invalid_ignored():
    """Points behind the camera and invalid rows must not corrupt the
    solve (zero weight, never inliers)."""
    xyz, uv, R, t, rng = scene(seed=2)
    n = len(xyz)
    behind = np.arange(0, 10)
    xyz = xyz.copy()
    # place some points behind every plausible camera
    xyz[behind, 2] = -50.0
    valid = np.ones(n, bool)
    valid[10:20] = False
    uv[10:20] = 1e3  # garbage coords on invalid rows
    R0, t0 = perturbed(R, t, rng)
    out = motion_only_ba(jnp.asarray(R0), jnp.asarray(t0),
                         jnp.asarray(xyz), jnp.asarray(uv),
                         jnp.asarray(valid))
    assert np.isfinite(np.asarray(out["R"])).all()
    assert np.linalg.norm(np.asarray(out["R"]) - R) < 5e-3
    inl = np.asarray(out["inliers"])
    assert not inl[behind].any()
    assert not inl[10:20].any()


def test_zero_valid_is_safe():
    """No correspondences at all: returns the prior, zero inliers, finite."""
    xyz, uv, R, t, rng = scene(seed=3)
    out = motion_only_ba(jnp.asarray(R), jnp.asarray(t),
                         jnp.asarray(xyz), jnp.asarray(uv),
                         jnp.zeros(len(xyz), bool))
    assert int(out["num_inliers"]) == 0
    assert np.isfinite(np.asarray(out["R"])).all()
    assert np.isfinite(np.asarray(out["t"])).all()
