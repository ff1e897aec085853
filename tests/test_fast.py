"""FAST-9 dense mask vs the literal per-pixel oracle."""

import numpy as np
import pytest

import oracles
from pislam_tpu.ops.fast import fast_detect

BORDER = 3


@pytest.mark.parametrize("threshold", [10, 20, 40])
def test_random_image(threshold):
    img = oracles.make_test_image(48, 64, seed=threshold)
    got = np.asarray(fast_detect(img, threshold))
    want = oracles.fast_detect(img, threshold, BORDER)
    b = BORDER
    np.testing.assert_array_equal(got[b:-b, b:-b], want[b:-b, b:-b])


def test_noise_image():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 48), dtype=np.uint8)
    got = np.asarray(fast_detect(img, 20))
    want = oracles.fast_detect(img, 20, BORDER)
    b = BORDER
    np.testing.assert_array_equal(got[b:-b, b:-b], want[b:-b, b:-b])


def test_synthetic_corner():
    # a bright square corner on dark background must fire
    img = np.zeros((32, 32), np.uint8)
    img[10:22, 10:22] = 200
    got = np.asarray(fast_detect(img, 20))
    want = oracles.fast_detect(img, 20, BORDER)
    b = BORDER
    np.testing.assert_array_equal(got[b:-b, b:-b], want[b:-b, b:-b])
    assert want.any(), "oracle should detect corners of the square"


def test_saturation_edges():
    # thresholds that saturate c - t below 0 / c + t above 255
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    img[:16] = np.where(img[:16] < 30, 5, img[:16])  # dark zone
    img[16:] = np.where(img[16:] > 225, 250, img[16:])  # bright zone
    got = np.asarray(fast_detect(img, 60))
    want = oracles.fast_detect(img, 60, BORDER)
    b = BORDER
    np.testing.assert_array_equal(got[b:-b, b:-b], want[b:-b, b:-b])
