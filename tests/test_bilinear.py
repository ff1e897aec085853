"""Byte-exact parity of the 7/8 and 13/16 downscalers vs the reference
golden models (BilinearTest.cpp:171-233)."""

import numpy as np
import pytest

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
