"""Gaussian 5x5 binomial blur, integer-exact RHADD semantics.

The reference implements the separable [1 4 6 4 1]/16 filter exclusively with
NEON vrhadd (round-halving-add) in a proven exact rewriting (reference
Gaussian.h:51-72); its gtest golden model *is* that RHADD chain
(GaussianTest.cpp:159-215). We keep the identical integer semantics -- so the
blur is byte-exact against the reference -- but express it as a dense, whole-
image vector program: per axis,

    out = RHADD(RHADD(RHADD(RHADD(a, e), c), c), RHADD(b, d))

with (a, b, c, d, e) = pixels at offsets (-2, -1, 0, +1, +2) and reflect-101
borders (GaussianTest.cpp:163-186: at i=0 the window is [m2, m1, m0, m1, m2];
at the bottom e reflects to m[h-2] then m[h-3]).

RHADD(a, b) == (a + b + 1) >> 1 (rounding-up halving add). Computed in uint16
to stay exact; images are uint8 HBM-resident.

Unlike the NEON version there is no padding requirement (no 8x16 block
machinery, no hstore strip, none of the 17 odd-size asm edge paths --
XLA's shape discipline dissolves those concerns, SURVEY.md section 5).
Requires width >= 3 and height >= 3 for the reflection to be defined
(reference requires >= 16x16).
"""

from __future__ import annotations

import jax.numpy as jnp


def _rhadd(a, b):
    """vrhadd: (a + b + 1) >> 1, exact in uint16."""
    return (a + b + jnp.uint16(1)) >> 1


def _reflect101_shift(img, offset, axis):
    """Pixel at index i+offset with reflect-101 (mirror-without-repeat) border.

    Matches the golden model's rolling-window border handling
    (GaussianTest.cpp:163-186): index -1 -> 1, -2 -> 2, h -> h-2, h+1 -> h-3.
    """
    n = img.shape[axis]
    idx = jnp.arange(n) + offset
    # reflect-101: map i to the triangle wave over [0, n-1]
    idx = jnp.abs(idx)
    idx = jnp.where(idx > n - 1, 2 * (n - 1) - idx, idx)
    return jnp.take(img, idx, axis=axis)


def _blur_axis(img_u16, axis):
    a = _reflect101_shift(img_u16, -2, axis)
    b = _reflect101_shift(img_u16, -1, axis)
    c = img_u16
    d = _reflect101_shift(img_u16, +1, axis)
    e = _reflect101_shift(img_u16, +2, axis)
    x = _rhadd(a, e)
    y = _rhadd(b, d)
    x = _rhadd(x, c)
    x = _rhadd(x, c)
    return _rhadd(x, y)


def gaussian5x5(img):
    """Blur a (..., H, W) uint8 image; byte-exact vs reference gaussian5x5.

    Vertical pass then horizontal pass, exactly like the golden model
    (GaussianTest.cpp:159-215). Batch dims broadcast.
    """
    x = img.astype(jnp.uint16)
    x = _blur_axis(x, axis=-2)
    x = _blur_axis(x, axis=-1)
    return x.astype(jnp.uint8)
