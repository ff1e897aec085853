"""Packed keypoint codec: score<<24 | x<<12 | y in one uint32.

Behavioural parity with reference Util.h:27-45 (encodeFast/decodeFastX/Y/
Score, rencodeFastScore). The packing gives 12-bit coordinates (max 4096 in
each dimension) and an 8-bit score, and makes plain integer comparison sort
score-major (then x, then y) -- the property the reference's bucket insertion
sort relies on (Fast.h:328-340) and that our batched top-k selection reuses.

Vectorised jnp implementations; work equally on numpy arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def encode(score, x, y):
    """(score, x, y) -> uint32 score<<24 | x<<12 | y. Reference Util.h:27."""
    score = jnp.asarray(score, jnp.uint32)
    x = jnp.asarray(x, jnp.uint32)
    y = jnp.asarray(y, jnp.uint32)
    return (score << 24) | (x << 12) | y


def reencode_score(score, encoded):
    """Replace the score field. Reference Util.h:31."""
    return (jnp.asarray(score, jnp.uint32) << 24) | (encoded & jnp.uint32(0xFFFFFF))


def decode_x(encoded):
    """Reference Util.h:35."""
    return (jnp.asarray(encoded, jnp.uint32) >> 12) & jnp.uint32(0xFFF)


def decode_y(encoded):
    """Reference Util.h:39."""
    return jnp.asarray(encoded, jnp.uint32) & jnp.uint32(0xFFF)


def decode_score(encoded):
    """Reference Util.h:43."""
    return jnp.asarray(encoded, jnp.uint32) >> 24
