"""Exhaustive dimension sweeps for the byte-exact image kernels.

The reference's whole test strategy is the dimension sweep: every (w, h) in
16..63 x 16..63 for the Gaussian (GaussianTest.cpp:153-156) and 1..47 x
1..47 for the bilinears (BilinearTest.cpp:165-168) -- the point being the
17 odd-size NEON edge paths. Our kernels have no such paths, but the sweep
still certifies the reflect-101 border semantics at every shape.

Naively this is 2304 distinct XLA compilations (~1 s each eagerly). Instead
we exploit an exact algebraic fact the kernel's own derivation documents
(ops/gaussian.py: "reflection in x commutes with blurring in y"): embedding
each test image WITH its own 2-column x-reflection into one wide composite
makes the composite blur reproduce every standalone blur exactly in the
image's column range. One kernel call per height (48 compiles) covers the
full 48x48 grid.

For the bilinears the blocks are fully independent (all reads stay inside
the 8x8 / 16x16 block, reference7_8/13_16 in BilinearTest.cpp), so a
width-concatenated composite per height covers all block-aligned shapes;
non-aligned sizes in the reference read whatever surrounds them in the
64x64 test buffer, i.e. they are the padded-up size by construction -- the
same x8/x16 padding contract our kernels assert (reference Bilinear.h:32,
:155).

The vectorised numpy goldens used here are validated against the LITERAL
per-pixel oracles (tests/oracles.py) on a sample of shapes first.
"""

import numpy as np
import jax
import pytest

import oracles
from pislam_tpu.ops.bilinear import bilinear7_8, bilinear13_16
from pislam_tpu.ops.gaussian import gaussian5x5


# -- vectorised numpy goldens -------------------------------------------------

def _rhadd(a, b):
    return (a + b + 1) >> 1


def np_gaussian5x5(img):
    """Vectorised RHADD-chain golden (reference GaussianTest.cpp:159-215)."""
    x = np.pad(img.astype(np.int64), 2, mode="reflect")

    def chain(m, axis):
        n = m.shape[axis] - 4
        sl = [np.take(m, np.arange(k, k + n), axis=axis) for k in range(5)]
        a, b, c, d, e = sl
        t = _rhadd(a, e)
        y = _rhadd(b, d)
        t = _rhadd(t, c)
        t = _rhadd(t, c)
        return _rhadd(t, y)

    x = chain(x, 0)
    x = chain(x, 1)
    return x.astype(np.uint8)


def _rshr(a):
    return (a >> 8) + ((a >> 7) & 1)


def np_bilinear7_8(img):
    """Vectorised reference7_8 (BilinearTest.cpp:171-196)."""
    f = np.array([238, 201, 165, 128, 91, 55, 18], np.int64)
    h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0
    m = img.astype(np.int64)
    out = np.zeros((h // 8 * 7, w // 8 * 7), np.int64)
    for y in range(7):
        for x in range(7):
            p00 = m[y::8, x::8][: h // 8, : w // 8]
            p01 = m[y::8, x + 1::8][: h // 8, : w // 8]
            p10 = m[y + 1::8, x::8][: h // 8, : w // 8]
            p11 = m[y + 1::8, x + 1::8][: h // 8, : w // 8]
            h0 = _rshr(p00 * f[x] + p01 * f[6 - x])
            h1 = _rshr(p10 * f[x] + p11 * f[6 - x])
            out[y::7, x::7] = _rshr(h0 * f[y] + h1 * f[6 - y])
    return out.astype(np.uint8)


def np_bilinear13_16(img):
    """Vectorised reference13_16 (BilinearTest.cpp:208-233)."""
    f = np.array([226, 167, 108, 49, 246, 187, 128, 69, 10, 207, 138, 89, 30],
                 np.int64)
    mp = [oracles._map13(i) for i in range(13)]
    h, w = img.shape
    assert h % 16 == 0 and w % 16 == 0
    m = img.astype(np.int64)
    out = np.zeros((h // 16 * 13, w // 16 * 13), np.int64)
    for y in range(13):
        for x in range(13):
            p00 = m[mp[y]::16, mp[x]::16][: h // 16, : w // 16]
            p01 = m[mp[y]::16, mp[x] + 1::16][: h // 16, : w // 16]
            p10 = m[mp[y] + 1::16, mp[x]::16][: h // 16, : w // 16]
            p11 = m[mp[y] + 1::16, mp[x] + 1::16][: h // 16, : w // 16]
            h0 = _rshr(p00 * f[x] + p01 * f[12 - x])
            h1 = _rshr(p10 * f[x] + p11 * f[12 - x])
            out[y::13, x::13] = _rshr(h0 * f[y] + h1 * f[12 - y])
    return out.astype(np.uint8)


# -- golden validation vs the literal oracles --------------------------------

@pytest.mark.parametrize("h,w", [(16, 16), (17, 23), (24, 19), (31, 31)])
def test_vectorised_gaussian_golden_matches_literal(h, w):
    rng = np.random.default_rng(h * 100 + w)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    np.testing.assert_array_equal(np_gaussian5x5(img),
                                  oracles.gaussian5x5(img))


@pytest.mark.parametrize("h,w", [(8, 16), (24, 8), (16, 16)])
def test_vectorised_bilinear_goldens_match_literal(h, w):
    rng = np.random.default_rng(h + w)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    np.testing.assert_array_equal(np_bilinear7_8(img),
                                  oracles.bilinear7_8(img))
    img16 = rng.integers(0, 256, (2 * h, 2 * w), dtype=np.uint8)
    np.testing.assert_array_equal(np_bilinear13_16(img16),
                                  oracles.bilinear13_16(img16))


# -- the sweeps ---------------------------------------------------------------

WIDTHS = range(16, 64)


def _composite_row(images):
    """Concatenate images each flanked by its own 2-col x-reflection.

    Returns (composite, offsets): offsets[i] + 2 is where image i's own
    output columns start inside the composite blur (see module docstring).
    """
    parts, offsets, off = [], [], 0
    for a in images:
        w = a.shape[1]
        block = np.concatenate(
            [a[:, 2:3], a[:, 1:2], a, a[:, w - 2:w - 1], a[:, w - 3:w - 2]],
            axis=1)
        parts.append(block)
        offsets.append(off)
        off += w + 4
    return np.concatenate(parts, axis=1), offsets


@pytest.mark.parametrize("h", range(16, 64))
def test_gaussian_dimension_sweep(h):
    """gaussian5x5 byte-exact at every (h, w), w in 16..63 (one composite)."""
    rng = np.random.default_rng(1000 + h)
    images = [rng.integers(0, 256, (h, w), dtype=np.uint8) for w in WIDTHS]
    comp, offsets = _composite_row(images)
    got = np.asarray(jax.jit(gaussian5x5)(comp))
    for a, off in zip(images, offsets):
        w = a.shape[1]
        np.testing.assert_array_equal(got[:, off + 2: off + 2 + w],
                                      np_gaussian5x5(a),
                                      err_msg=f"shape ({h}, {w})")


@pytest.mark.parametrize("h", range(8, 72, 8))
def test_bilinear7_8_dimension_sweep(h):
    """bilinear7_8 byte-exact at every block-aligned (h, w), w in 8..64."""
    rng = np.random.default_rng(2000 + h)
    images = [rng.integers(0, 256, (h, w), dtype=np.uint8)
              for w in range(8, 72, 8)]
    comp = np.concatenate(images, axis=1)
    got = np.asarray(jax.jit(bilinear7_8)(comp))
    off = 0
    for a in images:
        w = a.shape[1]
        ow = w // 8 * 7
        np.testing.assert_array_equal(got[:, off: off + ow],
                                      np_bilinear7_8(a),
                                      err_msg=f"shape ({h}, {w})")
        off += ow


@pytest.mark.parametrize("h", range(16, 80, 16))
def test_bilinear13_16_dimension_sweep(h):
    """bilinear13_16 byte-exact at every block-aligned (h, w), w in 16..64."""
    rng = np.random.default_rng(3000 + h)
    images = [rng.integers(0, 256, (h, w), dtype=np.uint8)
              for w in range(16, 80, 16)]
    comp = np.concatenate(images, axis=1)
    got = np.asarray(jax.jit(bilinear13_16)(comp))
    off = 0
    for a in images:
        w = a.shape[1]
        ow = w // 16 * 13
        np.testing.assert_array_equal(got[:, off: off + ow],
                                      np_bilinear13_16(a),
                                      err_msg=f"shape ({h}, {w})")
        off += ow
