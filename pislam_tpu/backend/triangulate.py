"""Multi-view linear triangulation (map initialisation for BA windows)."""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_two_view(R1, t1, R2, t2, p1, p2):
    """Batched midpoint triangulation of normalised correspondences.

    Poses are world->cam. Returns (N, 3) world points. Uses the relative
    pose (R, t): X_c2 = R X_c1 + t, solves depth along ray 1 in closed form
    (same derivation as geometry.epipolar.triangulate_depths), then lifts to
    world through camera 1.
    """
    R1t = jnp.swapaxes(R1, -1, -2)
    R = R2 @ R1t
    t = t2 - (R @ t1[..., None])[..., 0]

    d1 = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], -1)
    d2 = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], -1)
    rd1 = d1 @ jnp.swapaxes(R, -1, -2)
    c_rd1 = jnp.cross(d2, rd1)
    c_t = jnp.cross(d2, jnp.broadcast_to(t, d2.shape))
    s = -jnp.sum(c_rd1 * c_t, -1) / jnp.maximum(jnp.sum(c_rd1 * c_rd1, -1), 1e-12)
    x_c1 = s[..., None] * d1
    return (x_c1 - t1) @ R1  # R1^T (x_c1 - t1): cam1 -> world
