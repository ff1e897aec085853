"""Byte-exact parity of gaussian5x5 vs the reference RHADD golden model,
swept over odd shapes (the reference's own test strategy,
GaussianTest.cpp:153-156)."""

import numpy as np
import pytest

import oracles
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


def test_batched():
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (3, 24, 40), dtype=np.uint8)
    got = np.asarray(gaussian5x5(imgs))
    for b in range(3):
        np.testing.assert_array_equal(got[b], oracles.gaussian5x5(imgs[b]))
