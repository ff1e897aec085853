"""Homography estimation/decomposition (geometry/homography.py).

A single-plane scene: the case where the essential-matrix system is
degenerate and a real initialiser needs the homography path."""

import numpy as np
import jax
import jax.numpy as jnp

from pislam_tpu.geometry import homography, se3


def planar_scene(n=160, seed=0, noise=0.0):
    """Points on plane n.X = d; two views with known (R, t)."""
    rng = np.random.default_rng(seed)
    # plane z = 5 + 0.4 x + 0.2 y  ->  n=( -0.4, -0.2, 1 )/|.|, tilted
    x = rng.uniform(-3, 3, n)
    y = rng.uniform(-2, 2, n)
    z = 5.0 + 0.4 * x + 0.2 * y
    X = np.stack([x, y, z], 1).astype(np.float32)
    w = np.float32([0.05, -0.08, 0.03])
    R = np.asarray(se3.so3_exp(jnp.asarray(w))).astype(np.float32)
    t = np.float32([0.3, -0.1, 0.15])
    X2 = X @ R.T + t
    p1 = (X[:, :2] / X[:, 2:]).astype(np.float32)
    p2 = (X2[:, :2] / X2[:, 2:]).astype(np.float32)
    if noise:
        p1 = p1 + rng.normal(0, noise, p1.shape).astype(np.float32)
        p2 = p2 + rng.normal(0, noise, p2.shape).astype(np.float32)
    nrm = np.float32([-0.4, -0.2, 1.0])
    nrm /= np.linalg.norm(nrm)
    return p1, p2, R, t, nrm


def test_dlt_exact():
    p1, p2, *_ = planar_scene()
    H = np.asarray(homography.homography_dlt(
        jnp.asarray(p1[:40]), jnp.asarray(p2[:40])))
    err = np.asarray(homography.transfer_error(
        jnp.asarray(H), jnp.asarray(p1), jnp.asarray(p2)))
    assert np.sqrt(err).max() < 1e-4


def test_decomposition_recovers_pose_and_plane():
    p1, p2, R, t, nrm = planar_scene(seed=1)
    H = np.asarray(homography.homography_dlt(
        jnp.asarray(p1), jnp.asarray(p2)))
    Rk, tk, nk, support, *_rest = homography.recover_pose_homography(
        jnp.asarray(H), jnp.asarray(p1), jnp.asarray(p2),
        jnp.ones(len(p1), np.float32))
    assert float(support) > 0.9 * len(p1)
    assert np.linalg.norm(np.asarray(Rk) - R) < 1e-3
    tn = t / np.linalg.norm(t)
    assert np.linalg.norm(np.asarray(tk) - tn) < 1e-3
    # plane normal up to sign convention resolved by the front test
    assert abs(abs(float(np.asarray(nk) @ nrm)) - 1.0) < 1e-3


def test_ransac_homography_with_outliers():
    p1, p2, R, t, _ = planar_scene(seed=2, noise=2e-4)
    n = len(p1)
    rng = np.random.default_rng(5)
    bad = rng.permutation(n)[: n // 4]
    p2 = p2.copy()
    p2[bad] += rng.uniform(0.03, 0.2, (len(bad), 2)).astype(np.float32) * \
        rng.choice([-1, 1], (len(bad), 2))
    out = homography.ransac_homography(
        jax.random.PRNGKey(0), jnp.asarray(p1), jnp.asarray(p2),
        jnp.ones(n, bool), iters=256, inlier_threshold=2e-3)
    inl = np.asarray(out["inliers"])
    assert int(out["num_inliers"]) >= n - len(bad) - 5
    assert not inl[bad].any()
    # two views of a plane carry a FUNDAMENTAL two-fold (R, t) ambiguity
    # whose cheirality margins are noise- (and backend-) dependent: the
    # API contract is that the TRUE solution is among the two distinct
    # candidates returned; callers disambiguate with more parallax or a
    # third view (the ORB-SLAM initialiser defers exactly the same way)
    tn = t / np.linalg.norm(t)
    d1 = np.linalg.norm(np.asarray(out["R"]) - R)
    d2 = np.linalg.norm(np.asarray(out["R2"]) - R)
    assert min(d1, d2) < 2e-2, (d1, d2)
    tbest = out["t"] if d1 < d2 else out["t2"]
    assert np.linalg.norm(np.asarray(tbest) - tn) < 5e-2


def test_essential_degenerates_where_homography_does_not():
    """The motivating case: on a PERFECT single-plane scene the essential
    path's pose can be badly wrong while the homography path is exact."""
    from pislam_tpu.geometry import ransac as ransac_e

    p1, p2, R, t, _ = planar_scene(seed=3)
    n = len(p1)
    key = jax.random.PRNGKey(1)
    out_h = homography.ransac_homography(
        key, jnp.asarray(p1), jnp.asarray(p2), jnp.ones(n, bool), iters=128)
    assert np.linalg.norm(np.asarray(out_h["R"]) - R) < 1e-3
    # (the essential solver may or may not luck into the right member of
    # the planar-degenerate family; we only pin that homography is exact)


def test_pure_rotation_case():
    """A pure rotation (no parallax) yields t = 0 and R exactly."""
    rng = np.random.default_rng(7)
    X = rng.uniform([-3, -2, 4], [3, 2, 8], (100, 3)).astype(np.float32)
    w = np.float32([0.02, 0.1, -0.04])
    R = np.asarray(se3.so3_exp(jnp.asarray(w))).astype(np.float32)
    X2 = X @ R.T
    p1 = (X[:, :2] / X[:, 2:]).astype(np.float32)
    p2 = (X2[:, :2] / X2[:, 2:]).astype(np.float32)
    H = np.asarray(homography.homography_dlt(
        jnp.asarray(p1), jnp.asarray(p2)))
    Rc, tc, _n = homography.decompose_homography(jnp.asarray(H))
    # every candidate collapses to the rotation, zero translation
    assert np.linalg.norm(np.asarray(Rc[0]) - R) < 1e-3
    assert np.linalg.norm(np.asarray(tc)) < 1e-6


def test_select_model_planar_vs_general():
    """E/H model selection: a planar scene routes to the homography pose,
    a general 3D scene stays with the essential pose -- both accurate."""
    # planar: homography must win
    p1, p2, R, t, _ = planar_scene(seed=11)
    n = len(p1)
    out = homography.select_model(
        jax.random.PRNGKey(2), jnp.asarray(p1), jnp.asarray(p2),
        jnp.ones(n, bool), iters=128)
    assert bool(out["used_homography"])
    d1 = np.linalg.norm(np.asarray(out["R"]) - R)
    d2 = np.linalg.norm(np.asarray(out["R2"]) - R)
    assert min(d1, d2) < 2e-2, (d1, d2)

    # general 3D cloud: essential must win and be accurate
    rng = np.random.default_rng(13)
    X = rng.uniform([-3, -2, 3], [3, 2, 12], (160, 3)).astype(np.float32)
    w = np.float32([0.05, -0.08, 0.03])
    Rg = np.asarray(se3.so3_exp(jnp.asarray(w))).astype(np.float32)
    tg = np.float32([0.3, -0.1, 0.15])
    X2 = X @ Rg.T + tg
    q1 = (X[:, :2] / X[:, 2:]).astype(np.float32)
    q2 = (X2[:, :2] / X2[:, 2:]).astype(np.float32)
    out = homography.select_model(
        jax.random.PRNGKey(3), jnp.asarray(q1), jnp.asarray(q2),
        jnp.ones(len(q1), bool), iters=128)
    assert not bool(out["used_homography"])
    assert np.linalg.norm(np.asarray(out["R"]) - Rg) < 5e-3
    tn = tg / np.linalg.norm(tg)
    assert np.linalg.norm(np.asarray(out["t"]) - tn) < 1e-2
