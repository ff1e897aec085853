"""Lens distortion model (geometry/camera.py): round-trips + e2e VO."""

import numpy as np
import jax.numpy as jnp

from pislam_tpu.geometry import camera

TUMISH = (-0.2624, 0.1437, 0.0006, 0.0004)   # TUM fr1-class coefficients


def grid(extent=0.45, n=21):
    xs = np.linspace(-extent, extent, n)
    return np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2).astype(np.float32)


def test_undistort_round_trip():
    pts = grid()
    d = np.asarray(camera.distort_normalised(jnp.asarray(pts), *TUMISH))
    u = np.asarray(camera.undistort_normalised(jnp.asarray(d), *TUMISH))
    np.testing.assert_allclose(u, pts, atol=2e-6)


def test_distort_is_identity_without_coeffs():
    pts = grid()
    d = np.asarray(camera.distort_normalised(jnp.asarray(pts), 0.0))
    np.testing.assert_allclose(d, pts, atol=0)
    u = np.asarray(camera.undistort_normalised(jnp.asarray(pts), 0.0))
    np.testing.assert_allclose(u, pts, atol=0)


def test_distortion_magnitude_matters():
    """At TUM-class k1 the border displacement is several pixels -- the
    correction is not cosmetic."""
    pts = np.float32([[0.4, 0.3]])
    d = np.asarray(camera.distort_normalised(jnp.asarray(pts), *TUMISH))
    # ~ 525 px focal: displacement in pixels
    disp_px = np.abs(d - pts).max() * 525.0
    assert disp_px > 5.0, disp_px


def test_vo_with_distorted_camera():
    """A distorting camera breaks uncorrected VO and the dist parameter
    fixes it (full matching+RANSAC+chaining path, synthetic projector)."""
    from test_models import (FX, FY, CX, CY, K_SLOTS, make_world,
                             make_trajectory, gt_positions)
    from pislam_tpu.evaluation import ate_rmse
    from pislam_tpu.frontend import Features
    from pislam_tpu.models.visual_odometry import VisualOdometry
    from test_models import tiny_cfg

    from pislam_tpu.geometry import se3

    xyz, desc = make_world(seed=31)
    # stronger motion than the default arc: features sweep across the
    # field where the distortion varies, so uncorrected epipolar geometry
    # accumulates real error
    Rs, ts = [], []
    for i in range(14):
        w = np.float32([0.01 * i, 0.05 * i, 0.02 * i])
        R = np.asarray(se3.so3_exp(jnp.asarray(w))).astype(np.float32)
        c = np.float32([0.35 * i, 0.05 * i, 0.12 * i])
        Rs.append(R); ts.append((-R @ c).astype(np.float32))

    def distorted_projector(frame_idx):
        i = int(frame_idx)
        xc = xyz @ Rs[i].T + ts[i]
        z = xc[:, 2]
        uv = xc[:, :2] / np.maximum(z[:, None], 1e-6)
        uv = np.asarray(camera.distort_normalised(jnp.asarray(
            uv.astype(np.float32)), *TUMISH))
        u = FX * uv[:, 0] + CX
        v = FY * uv[:, 1] + CY
        vis = (z > 0.5) & (u >= 16) & (u < 624) & (v >= 16) & (v < 464)
        order = np.argsort(~vis)
        sel = order[:K_SLOTS]
        ui = np.round(u[sel]).astype(np.int64)
        vi = np.round(v[sel]).astype(np.int64)
        valid = vis[sel]
        codes = np.where(valid, ((200 << 24) | (ui << 12) | vi), 0)
        return Features(
            codes=jnp.asarray(codes.astype(np.uint32)),
            valid=jnp.asarray(valid),
            angles=jnp.zeros(K_SLOTS, jnp.uint8),
            descriptors=jnp.asarray(np.where(valid[:, None], desc[sel], 0)))

    cfg = tiny_cfg()
    gt = gt_positions(Rs, ts)

    def run(dist):
        vo = VisualOdometry(cfg, FX, FY, CX, CY,
                            features_fn=distorted_projector, dist=dist)
        st = vo.init(0)
        pos = [vo.camera_position(st)]
        for i in range(1, 14):
            st, _ = vo.process(st, i)
            pos.append(vo.camera_position(st))
        return ate_rmse(np.stack(pos), gt, with_scale=True)

    err_corrected = run(TUMISH)
    err_naive = run(None)
    assert err_corrected < 0.15, err_corrected
    # uncorrected epipolar geometry on a distorting lens is clearly worse
    assert err_naive > 1.5 * err_corrected, (err_naive, err_corrected)
