"""Windowed sparse bundle adjustment with Schur-complement reduction.

No reference counterpart (the reference is the SLAM *frontend* only,
README.md:22); specified by BASELINE.json north star: "sparse bundle
adjustment with Schur-complement reduction ... BA reductions over ICI
collectives". TPU-first design decisions (SURVEY.md section 7, hard part (d)):

* Fixed-shape block sparsity: a BA window holds C poses, P landmark slots and
  O observation slots, each with validity masks. Invalid slots carry zero
  Jacobians and drop out of every sum.
* The camera-point coupling W is stored DENSE per point -- (P, C*6, 3) -- which
  is tiny for windowed BA (C<=16) and turns the Schur complement into one
  einsum on the MXU instead of sparse scatter-gathers:
      S = H_cc + lambda I - sum_p W_p Hpp_p^{-1} W_p^T
* Landmark blocks H_pp are (P, 3, 3); their inverses are closed-form adjugate
  (batched, no linalg loop).
* Gauss-Newton/LM runs a fixed number of iterations (lax.scan) with
  accept/reject damping updates expressed as jnp.where -- no data-dependent
  control flow.

Camera model: normalised pinhole. A world point X observed by pose (R, t)
projects to pi(R X + t), pi(x, y, z) = (x/z, y/z); residual = pi - uv.
Pose updates are left-multiplicative twists: pose <- exp(delta) o pose.
Gauge freedom: camera 0 is held fixed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3


class BAProblem(NamedTuple):
    """One BA window (all arrays fixed-shape, masked)."""
    R: jax.Array          # (C, 3, 3) world->cam rotations
    t: jax.Array          # (C, 3)
    points: jax.Array     # (P, 3) world landmarks
    obs_cam: jax.Array    # (O,) int32 camera index per observation
    obs_pt: jax.Array     # (O,) int32 landmark index
    obs_uv: jax.Array     # (O, 2) normalised measurements
    obs_valid: jax.Array  # (O,) bool
    cam_valid: jax.Array  # (C,) bool
    pt_valid: jax.Array   # (P,) bool


def _project(R, t, X):
    xc = (R @ X[..., None])[..., 0] + t
    z = jnp.maximum(xc[..., 2], 1e-6)
    return xc[..., :2] / z[..., None], xc


def residuals_and_jacobians(p: BAProblem):
    """Per-observation residual (O, 2), J_c (O, 2, 6), J_p (O, 2, 3).

    J_c is wrt a left-multiplicative twist [rho, w] on (R, t):
        d(xc)/d rho = I,  d(xc)/d w = -[xc]_x
    and J_p is wrt the world point: d(xc)/dX = R.
    Projection jacobian: d(pi)/d(xc) = [[1/z, 0, -x/z^2], [0, 1/z, -y/z^2]].
    """
    R = p.R[p.obs_cam]
    t = p.t[p.obs_cam]
    X = p.points[p.obs_pt]
    uv, xc = _project(R, t, X)
    r = uv - p.obs_uv

    x, y, z = xc[..., 0], xc[..., 1], jnp.maximum(xc[..., 2], 1e-6)
    zinv = 1.0 / z
    zero = jnp.zeros_like(zinv)
    # (O, 2, 3) projection jacobian
    jpi = jnp.stack([
        jnp.stack([zinv, zero, -x * zinv * zinv], -1),
        jnp.stack([zero, zinv, -y * zinv * zinv], -1),
    ], -2)

    dxc_dw = -se3.hat(xc)                       # (O, 3, 3)
    jc = jnp.concatenate([jpi, jpi @ dxc_dw], -1)  # (O, 2, 6): [d/drho, d/dw]
    jp = jpi @ R                                # (O, 2, 3)

    w = (p.obs_valid
         & p.cam_valid[p.obs_cam]
         & p.pt_valid[p.obs_pt]).astype(r.dtype)
    return r * w[:, None], jc * w[:, None, None], jp * w[:, None, None], w


def _adjugate_inv3(m, damping):
    """Batched closed-form inverse of (…,3,3) SPD blocks with LM damping."""
    m = m + damping * jnp.eye(3, dtype=m.dtype)
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), (b * f - c * e)], -1),
        jnp.stack([B, (a * i - c * g), -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), (a * e - b * d)], -1),
    ], -2)
    return adj / det[..., None, None]


def gn_normal_blocks(p: BAProblem, r, jc, jp):
    """Assemble the Schur ingredients from per-observation terms.

    Returns (H_cc (C,6,6), b_c (C,6), H_pp (P,3,3), b_p (P,3),
    W (P, C, 6, 3)). All via segment_sum -- the TPU-native scatter-add.
    """
    C = p.R.shape[0]
    P = p.points.shape[0]

    hcc = jax.ops.segment_sum(
        jnp.einsum("oki,okj->oij", jc, jc), p.obs_cam, num_segments=C)
    bc = jax.ops.segment_sum(
        -jnp.einsum("oki,ok->oi", jc, r), p.obs_cam, num_segments=C)
    hpp = jax.ops.segment_sum(
        jnp.einsum("oki,okj->oij", jp, jp), p.obs_pt, num_segments=P)
    bp = jax.ops.segment_sum(
        -jnp.einsum("oki,ok->oi", jp, r), p.obs_pt, num_segments=P)
    # W indexed by (point, camera): flatten pair index for one segment_sum
    wobs = jnp.einsum("oki,okj->oij", jc, jp)  # (O, 6, 3)
    pair = p.obs_pt * C + p.obs_cam
    w = jax.ops.segment_sum(wobs, pair, num_segments=P * C)
    return hcc, bc, hpp, bp, w.reshape(P, C, 6, 3)


def schur_reduce(hcc, bc, hpp, bp, w, damping, cam_valid, axis_name=None):
    """Form the reduced camera system (S, b) and the point-solve helper.

    S = blockdiag(H_cc) + lambda I - sum_p Wp Hpp^{-1} Wp^T   ((6C, 6C) dense)
    b = b_c - sum_p Wp Hpp^{-1} b_p

    With `axis_name`, landmark shards are reduced over the mesh axis with
    psum (hcc/bc are also partial sums over the local observation shard):
    this IS the distributed Schur-complement reduction over ICI collectives
    (BASELINE.json north star). The returned (hpp_inv, wf) stay local to the
    shard for back-substitution.
    """
    C = hcc.shape[0]
    P = hpp.shape[0]
    hpp_inv = _adjugate_inv3(hpp, damping)          # (P, 3, 3) local
    wf = w.reshape(P, C * 6, 3)                     # camera-major block rows
    whi = jnp.einsum("pij,pjk->pik", wf, hpp_inv)   # (P, 6C, 3)
    cross = jnp.einsum("pik,plk->il", whi, wf)      # (6C, 6C) local partial
    bcross = jnp.einsum("pik,pk->pi", whi, bp).sum(0).reshape(-1)
    if axis_name is not None:
        hcc = jax.lax.psum(hcc, axis_name)
        bc = jax.lax.psum(bc, axis_name)
        cross = jax.lax.psum(cross, axis_name)
        bcross = jax.lax.psum(bcross, axis_name)
    idx = jnp.arange(C)
    s = (-cross).reshape(C, 6, C, 6).at[idx, :, idx, :].add(hcc)
    s = s.reshape(6 * C, 6 * C) + damping * jnp.eye(6 * C, dtype=cross.dtype)
    b = bc.reshape(-1) - bcross

    # gauge + invalid cameras: pin their deltas to zero via identity rows
    pin = jnp.repeat(~cam_valid | (jnp.arange(C) == 0), 6)
    s = jnp.where(pin[:, None] | pin[None, :],
                  jnp.eye(6 * C, dtype=s.dtype), s)
    b = jnp.where(pin, 0.0, b)
    return s, b, hpp_inv, wf


def ba_cost(p: BAProblem):
    r, _, _, w = residuals_and_jacobians(p)
    return jnp.sum(r * r), jnp.sum(w)


def _apply_update(p: BAProblem, dc, dp, pt_valid):
    dR, dt = se3.se3_exp(dc)
    Rn = dR @ p.R
    tn = (dR @ p.t[..., None])[..., 0] + dt
    Xn = p.points + dp * pt_valid[:, None]
    return p._replace(R=Rn, t=tn, points=Xn)


def ba_iterations(p: BAProblem, iters: int, damping: float, axis_name=None):
    """LM iteration loop, optionally distributed over `axis_name` (landmark/
    observation shards; poses replicated). Pure function, jit/shard_map-safe."""

    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    def step(carry, _):
        prob, lam = carry
        r, jc, jp, wmask = residuals_and_jacobians(prob)
        cost0 = allsum(jnp.sum(r * r))
        hcc, bc, hpp, bp, w = gn_normal_blocks(prob, r, jc, jp)
        s, b, hpp_inv, wf = schur_reduce(
            hcc, bc, hpp, bp, w, lam, prob.cam_valid, axis_name=axis_name)
        dc_flat = jnp.linalg.solve(s, b)
        dc = dc_flat.reshape(-1, 6)
        # back-substitute landmarks: dp = Hpp^{-1} (b_p - W^T dc), local shard
        dp = jnp.einsum("pij,pj->pi", hpp_inv,
                        bp - jnp.einsum("pik,i->pk", wf, dc_flat))
        cand = _apply_update(prob, dc, dp, prob.pt_valid)
        r1, _, _, _ = residuals_and_jacobians(cand)
        cost1 = allsum(jnp.sum(r1 * r1))
        accept = cost1 < cost0
        new_prob = jax.tree.map(
            lambda a, bb: jnp.where(accept, a, bb), cand, prob)
        new_lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7),
                            jnp.minimum(lam * 4.0, 1e3))
        return (new_prob, new_lam), jnp.where(accept, cost1, cost0)

    (prob, lam), costs = jax.lax.scan(
        step, (p, jnp.asarray(damping, p.points.dtype)), None, length=iters)
    return prob, {"costs": costs, "final_damping": lam}


@partial(jax.jit, static_argnames=("iters",))
def bundle_adjust(p: BAProblem, iters: int = 8, damping: float = 1e-4):
    """Run `iters` LM iterations single-device. Returns (problem, info)."""
    return ba_iterations(p, iters, damping)
