"""Byte-exact parity of gaussian5x5 vs the reference RHADD golden model,
swept exhaustively over every (h, w) in (16..63)^2 -- the reference's own
test strategy (GaussianTest.cpp:153-156)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import oracles
from pislam_tpu.ops import gaussian
from pislam_tpu.ops.gaussian import gaussian5x5


@pytest.mark.parametrize("h,w", [(16, 16), (16, 19), (17, 16), (23, 31),
                                 (33, 40), (48, 63)])
def test_random_exact(h, w):
    rng = np.random.default_rng(h * 64 + w)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    got = np.asarray(gaussian5x5(img))
    want = oracles.gaussian5x5(img)
    np.testing.assert_array_equal(got, want)


def test_spiral_exact():
    img = np.zeros((48, 48), np.uint8)
    phi = (1 + np.sqrt(5)) / 2
    for theta in np.arange(0, 20, 0.01):
        r = phi ** (theta * 2 / np.pi)
        x, y = r * np.cos(theta), r * np.sin(theta)
        for sx, sy in ((x, y), (-x, -y)):
            i, j = int(sy + 16), int(sx + 16)
            if 0 <= i < 48 and 0 <= j < 48:
                img[i, j] = 0xFF
    np.testing.assert_array_equal(
        np.asarray(gaussian5x5(img)), oracles.gaussian5x5(img)
    )


@pytest.mark.parametrize("h,w", [(16, 16), (16, 19), (17, 16), (23, 31),
                                 (33, 40), (48, 63), (63, 63)])
def test_scalar_vs_vectorized_golden(h, w):
    """Anchor the sweep's vectorized golden to the literal scalar oracle."""
    rng = np.random.default_rng(h * 101 + w)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    np.testing.assert_array_equal(oracles.gaussian5x5_fast(img),
                                  oracles.gaussian5x5(img))


def test_dimension_sweep_exhaustive():
    """Every (h, w) in (16..63)^2 -- the reference's full dimension sweep
    (GaussianTest.cpp:153-156, Combine(Range(16,64), Range(16,64))).

    Compiling the production kernel once per shape costs ~1.5 s on CPU
    (~1 h for 2304 shapes), so the sweep batches every shape through ONE
    compiled run of the production RHADD pipeline (gaussian._shifts +
    gaussian._rhadd_chain, the entire arithmetic) on fixed 67x67 canvases,
    with the reflect-101 border pre-applied host-side per true shape.
    The production jnp.pad reflection itself is pinned end-to-end by
    test_random_exact/test_spiral_exact above; the vectorized golden is
    anchored to the scalar oracle by test_scalar_vs_vectorized_golden.
    """
    shapes = [(h, w) for h in range(16, 64) for w in range(16, 64)]
    rng = np.random.default_rng(2026)
    imgs = [rng.integers(0, 256, s, dtype=np.uint8) for s in shapes]

    canvas = np.zeros((len(shapes), 67, 67), np.uint8)
    for k, im in enumerate(imgs):
        p = np.pad(im, 2, mode="reflect")
        canvas[k, :p.shape[0], :p.shape[1]] = p

    @jax.jit
    def run(c):
        x = gaussian._rhadd_chain(*gaussian._shifts(c.astype(jnp.uint16),
                                                    axis=-2))
        x = gaussian._rhadd_chain(*gaussian._shifts(x, axis=-1))
        return x.astype(jnp.uint8)

    out = np.asarray(run(jnp.asarray(canvas)))
    for k, im in enumerate(imgs):
        h, w = im.shape
        np.testing.assert_array_equal(out[k, :h, :w],
                                      oracles.gaussian5x5_fast(im),
                                      err_msg=f"shape {(h, w)}")


def test_batched():
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (3, 24, 40), dtype=np.uint8)
    got = np.asarray(gaussian5x5(imgs))
    for b in range(3):
        np.testing.assert_array_equal(got[b], oracles.gaussian5x5(imgs[b]))
