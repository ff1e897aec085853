"""Geometry layer: SE3 round trips, 8-point + RANSAC pose recovery on a
synthetic two-view scene with outliers."""

import numpy as np
import jax
import jax.numpy as jnp

from pislam_tpu.geometry import se3, epipolar, ransac


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 1.0, (32, 3)).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    # orthonormal, det 1
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    w2 = np.asarray(se3.so3_log(jnp.asarray(R)))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    xi = rng.normal(0, 0.8, (16, 6)).astype(np.float32)
    R, t = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(R, t))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def synthetic_scene(n=200, outliers=40, seed=3, noise=0.0):
    rng = np.random.default_rng(seed)
    X = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3)).astype(np.float32)
    w = np.float32([0.05, -0.12, 0.03])
    t = np.float32([0.4, 0.1, -0.05])
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    X2 = X @ R.T + t
    p1 = (X[:, :2] / X[:, 2:]).astype(np.float32)
    p2 = (X2[:, :2] / X2[:, 2:]).astype(np.float32)
    if noise:
        p1 += rng.normal(0, noise, p1.shape).astype(np.float32)
        p2 += rng.normal(0, noise, p2.shape).astype(np.float32)
    if outliers:
        bad = rng.choice(n, outliers, replace=False)
        p2[bad] = rng.uniform(-0.5, 0.5, (outliers, 2)).astype(np.float32)
    gt_inliers = np.ones(n, bool)
    if outliers:
        gt_inliers[bad] = False
    return p1, p2, R, t, gt_inliers


def test_eight_point_noise_free():
    p1, p2, R, t, _ = synthetic_scene(outliers=0)
    E = np.asarray(epipolar.essential_8pt(jnp.asarray(p1), jnp.asarray(p2)))
    err = np.asarray(epipolar.sampson_error(
        jnp.asarray(E), jnp.asarray(p1), jnp.asarray(p2)))
    assert err.max() < 1e-8


def test_recover_pose_direction():
    p1, p2, R, t, _ = synthetic_scene(outliers=0)
    E = epipolar.essential_8pt(jnp.asarray(p1), jnp.asarray(p2))
    Rr, tr, support = epipolar.recover_pose(
        E, jnp.asarray(p1), jnp.asarray(p2), jnp.ones(len(p1), jnp.float32))
    Rr, tr = np.asarray(Rr), np.asarray(tr)
    assert int(support) == len(p1)
    np.testing.assert_allclose(Rr, R, atol=1e-4)
    cos = abs(np.dot(tr, t) / (np.linalg.norm(tr) * np.linalg.norm(t)))
    assert cos > 0.9999  # translation recovered up to scale


def test_ransac_with_outliers():
    p1, p2, R, t, gt_inliers = synthetic_scene(n=300, outliers=90, noise=5e-4)
    out = ransac.ransac_essential(
        jax.random.PRNGKey(0), jnp.asarray(p1), jnp.asarray(p2),
        jnp.ones(len(p1), bool), iters=256, inlier_threshold=2e-5)
    inl = np.asarray(out["inliers"])
    # must find the true inlier structure (allow small slack)
    assert inl[gt_inliers].mean() > 0.9
    assert inl[~gt_inliers].mean() < 0.1
    Rr, tr = np.asarray(out["R"]), np.asarray(out["t"])
    np.testing.assert_allclose(Rr, R, atol=5e-3)
    cos = abs(np.dot(tr, t) / (np.linalg.norm(tr) * np.linalg.norm(t)))
    assert cos > 0.999


def test_ransac_respects_validity():
    p1, p2, R, t, _ = synthetic_scene(n=100, outliers=0)
    valid = np.zeros(100, bool)
    valid[:60] = True
    out = ransac.ransac_essential(
        jax.random.PRNGKey(1), jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(valid), iters=64, inlier_threshold=1e-6)
    inl = np.asarray(out["inliers"])
    assert not inl[~valid].any()


def test_so3_log_differentiable_at_identity():
    """JVPs of log must be finite at (and near) the identity: the analytic
    pose-graph Jacobians autodiff through log exactly where edges are
    near-converged (residual ~ 0)."""
    def f(w):
        return se3.so3_log(se3.so3_exp(w))

    for w0 in (np.zeros(3, np.float32),
               np.float32([1e-5, -2e-5, 1e-5]),
               np.float32([0.03, -0.01, 0.02])):
        J = jax.jacfwd(f)(jnp.asarray(w0))
        assert np.isfinite(np.asarray(J)).all(), (w0, J)
        np.testing.assert_allclose(np.asarray(J), np.eye(3),
                                   atol=3e-3 + 10 * np.abs(w0).max())

    def g(xi):
        return se3.se3_log(*se3.se3_exp(xi))

    J = jax.jacfwd(g)(jnp.zeros(6))
    assert np.isfinite(np.asarray(J)).all()
    np.testing.assert_allclose(np.asarray(J), np.eye(6), atol=1e-4)
