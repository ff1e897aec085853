"""Byte-exact parity of the 7/8 and 13/16 downscalers vs the reference
golden models (BilinearTest.cpp:171-233), swept over every valid padded
shape like the reference's (1..47)^2 dimension sweep
(BilinearTest.cpp:165-168)."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracles
from pislam_tpu.ops.bilinear import bilinear7_8, bilinear13_16, resize_bilinear


@pytest.mark.parametrize("h,w", [(8, 8), (16, 24), (40, 32), (48, 48)])
def test_7_8_exact(h, w):
    rng = np.random.default_rng(h + w)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(bilinear7_8(img)),
                                  oracles.bilinear7_8(img))


@pytest.mark.parametrize("h,w", [(16, 16), (32, 48), (48, 32)])
def test_13_16_exact(h, w):
    rng = np.random.default_rng(h * w)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(bilinear13_16(img)),
                                  oracles.bilinear13_16(img))


def _block_sweep(kernel, oracle, block, out_block):
    """Sweep every (h, w) multiple of ``block`` in [block, 64] through ONE
    batched call of the production kernel.

    The reference sweeps (1..47)^2 with partial blocks reading into its
    64-wide padded buffer (BilinearTest.cpp:165-168); our contract requires
    block-multiple padding (Bilinear.h:32,:155 equivalents), so the valid
    sweep is every padded shape. Each shape gets its own random canvas;
    because blocks map independently (an 8x8/16x16 input block touches only
    its own output block), the (h, w) result is the top-left crop of the
    full-canvas result, so one (N, 64, 64) batched dispatch covers every
    shape with a single compile (per-shape compiles cost ~1.5 s each).
    """
    sizes = list(range(block, 65, block))
    shapes = [(h, w) for h in sizes for w in sizes]
    rng = np.random.default_rng(len(sizes))
    canvases = rng.integers(0, 256, (len(shapes), 64, 64), dtype=np.uint8)
    out = np.asarray(kernel(jnp.asarray(canvases)))
    for k, (h, w) in enumerate(shapes):
        oh, ow = h // block * out_block, w // block * out_block
        np.testing.assert_array_equal(out[k, :oh, :ow],
                                      oracle(canvases[k, :h, :w]),
                                      err_msg=f"shape {(h, w)}")


def test_7_8_dimension_sweep():
    _block_sweep(bilinear7_8, oracles.bilinear7_8, 8, 7)


def test_13_16_dimension_sweep():
    _block_sweep(bilinear13_16, oracles.bilinear13_16, 16, 13)


def test_resize_shapes_and_identity():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    out = np.asarray(resize_bilinear(img, 40, 53))
    assert out.shape == (40, 53)
    # identity resize is exact
    same = np.asarray(resize_bilinear(img, 48, 64))
    np.testing.assert_array_equal(same, img)


def test_resize_constant_preserved():
    img = np.full((32, 32), 77, np.uint8)
    out = np.asarray(resize_bilinear(img, 27, 27))
    np.testing.assert_array_equal(out, np.full((27, 27), 77, np.uint8))
