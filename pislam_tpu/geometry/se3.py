"""SE(3) / SO(3) utilities in pure JAX (float64-free, TPU-friendly float32).

No reference counterpart (the reference is frontend-only, README.md:22); this
underpins the VO/pose-graph/BA backend specified by BASELINE.json's north
star. Conventions: rotation matrices act on column vectors; exp/log use the
standard Rodrigues forms with small-angle Taylor guards so everything is
differentiable and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def so3_exp(w):
    """(..., 3) axis-angle -> (..., 3, 3) rotation (Rodrigues)."""
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    k = hat(w)
    k2 = k @ k
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS)
    # Taylor fallbacks for tiny angles
    a = jnp.where(theta2 > _EPS, a, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > _EPS, b, 0.5 - theta2 / 24.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + a * k + b * k2


def so3_log(R):
    """(..., 3, 3) rotation -> (..., 3) axis-angle."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos)
    v = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], -1)
    s = jnp.where(theta[..., None] > 1e-5,
                  theta[..., None] / (2.0 * jnp.sin(theta[..., None]) + _EPS),
                  0.5 + theta[..., None] ** 2 / 12.0)
    return v * s


def se3_exp(xi):
    """(..., 6) twist [rho, w] -> ((..., 3, 3) R, (..., 3) t)."""
    rho, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    k = hat(w)
    k2 = k @ k
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS)
    c = (theta - jnp.sin(theta)) / (theta2.clip(_EPS * _EPS) * theta)
    b = jnp.where(theta2 > _EPS, b, 0.5 - theta2 / 24.0)
    c = jnp.where(theta2 > _EPS, c, 1.0 / 6.0 - theta2 / 120.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), k.shape)
    V = eye + b * k + c * k2
    t = (V @ rho[..., None])[..., 0]
    return R, t


def se3_log(R, t):
    """Inverse of se3_exp: ((...,3,3), (...,3)) -> (..., 6) twist."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    k = hat(w)
    k2 = k @ k
    # V^{-1} = I - k/2 + (1/theta^2)(1 - a/(2b)) k^2
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS)
    coef = jnp.where(theta2 > _EPS,
                     (1.0 - a / (2.0 * b)) / theta2.clip(_EPS * _EPS),
                     1.0 / 12.0 + theta2 / 720.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    Vinv = eye - 0.5 * k + coef * k2
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, w], -1)


def compose(Ra, ta, Rb, tb):
    """(Ra, ta) * (Rb, tb): X -> Ra (Rb X + tb) + ta."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def transform(R, t, X):
    """Apply: (..., 3, 3), (..., 3), (..., N, 3) -> (..., N, 3)."""
    return X @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
