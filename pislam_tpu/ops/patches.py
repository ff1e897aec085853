"""Per-keypoint 31x31 patch gather.

The reference's per-feature stages (orbCentroids' radius-15 disc moments,
Orb.h:80-308, and the BRIEF compares, Brief.h:28-53) all read from the
31x31 window around each keypoint. We gather that window once per keypoint
into a (K, 31, 31) tensor; orientation reduces it with one MXU matmul and
BRIEF indexes it with a per-rotation lookup table, so the gather is the only
irregular memory access in the whole frontend (SURVEY.md section 7, hard
part (b)).

Invalid keypoints are redirected to a safe coordinate (border, border); their
outputs are garbage and must be masked by `valid`.
"""

from __future__ import annotations

import jax.numpy as jnp

RADIUS = 15
PATCH = 2 * RADIUS + 1  # 31


def gather_patches(img, xs, ys, valid):
    """img (H, W) uint8; xs/ys (K,) int32 -> (K, 31, 31) uint8 patches."""
    h, w = img.shape
    safe_x = jnp.where(valid, xs, RADIUS + 1).astype(jnp.int32)
    safe_y = jnp.where(valid, ys, RADIUS + 1).astype(jnp.int32)
    dy = jnp.arange(-RADIUS, RADIUS + 1, dtype=jnp.int32)
    dx = jnp.arange(-RADIUS, RADIUS + 1, dtype=jnp.int32)
    rows = safe_y[:, None] + dy[None, :]  # (K, 31)
    cols = safe_x[:, None] + dx[None, :]  # (K, 31)
    # clamp for safety; valid keypoints always have border >= 15 clearance
    rows = jnp.clip(rows, 0, h - 1)
    cols = jnp.clip(cols, 0, w - 1)
    return img[rows[:, :, None], cols[:, None, :]]
