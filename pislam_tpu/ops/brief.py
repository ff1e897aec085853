"""Rotated BRIEF (ORB) 256-bit descriptors via a rotation lookup table.

Reference: Brief.h hardcodes the 256 learned OpenCV-ORB point pairs as
template instantiations, rotating each pair at *compile time* into 30
specialised 4KB functions dispatched by a runtime switch (Brief.h:28-53,
637-733). The TPU-idiomatic inversion (SURVEY.md section 7) is a precomputed
(30, 256, 2) rotated-coordinate table and one batched gather from the 31x31
patches already fetched for orientation: descriptor bit i is

    patch[idx0[angle, i]] < patch[idx1[angle, i]]        (Brief.h:52)

Rotation semantics reproduced exactly (Brief.h:30-50): theta = rot*pi/15 in
float32, coordinates rotated with float32 cos/sin, roundf (half away from
zero), then clamped to [-15, 15].

Bit packing: word w, bit b -> pattern index 32*w + b; bits OR'd as 1 << b
(Brief.h:71-133). `words` in 1..8 selects 32..256-bit descriptors
(Orb.h:389-392).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ._brief_pattern import BRIEF_PATTERN
from .patches import RADIUS, PATCH

N_ROT = 30
N_BITS = 256


def _round_half_away(x):
    """C roundf: round half away from zero."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def _rotation_tables():
    """(30, 256) flat patch indices for point 0 and point 1."""
    pat = np.array(BRIEF_PATTERN, np.int32)  # (256, 4): dx0, dy0, dx1, dy1
    idx0 = np.zeros((N_ROT, N_BITS), np.int32)
    idx1 = np.zeros((N_ROT, N_BITS), np.int32)
    for rot in range(N_ROT):
        theta = np.float32(rot * np.pi / 15)
        c = np.float32(np.cos(theta))
        s = np.float32(np.sin(theta))
        dx0, dy0, dx1, dy1 = (pat[:, i].astype(np.float32) for i in range(4))
        rdx0 = np.clip(_round_half_away(c * dx0 - s * dy0), -15, 15).astype(np.int32)
        rdy0 = np.clip(_round_half_away(s * dx0 + c * dy0), -15, 15).astype(np.int32)
        rdx1 = np.clip(_round_half_away(c * dx1 - s * dy1), -15, 15).astype(np.int32)
        rdy1 = np.clip(_round_half_away(s * dx1 + c * dy1), -15, 15).astype(np.int32)
        idx0[rot] = (rdy0 + RADIUS) * PATCH + (rdx0 + RADIUS)
        idx1[rot] = (rdy1 + RADIUS) * PATCH + (rdx1 + RADIUS)
    return idx0, idx1

IDX0, IDX1 = _rotation_tables()


def describe(patches, angles, words: int = 8):
    """(K, 31, 31) patches + (K,) uint8 angle bins -> (K, words) uint32.

    Equivalent to briefDescribe over every keypoint (orbCompute's 15-pass
    I-cache trick, Orb.h:402-421, is irrelevant on TPU: all 30 rotations are
    one table lookup).
    """
    k = patches.shape[0]
    flat = patches.reshape(k, PATCH * PATCH)
    a = angles.astype(jnp.int32)
    i0 = jnp.asarray(IDX0)[a]  # (K, 256)
    i1 = jnp.asarray(IDX1)[a]
    p0 = jnp.take_along_axis(flat, i0, axis=1)
    p1 = jnp.take_along_axis(flat, i1, axis=1)
    bits = (p0 < p1).astype(jnp.uint32)  # (K, 256)
    bits = bits[:, : words * 32].reshape(k, words, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)
