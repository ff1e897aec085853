"""Centroid moments (exact) and atan2 bins vs the oracle."""

import numpy as np

import oracles
from pislam_tpu.ops import orientation, patches


def test_centroids_exact():
    img = oracles.make_test_image(80, 80, seed=1)
    rng = np.random.default_rng(2)
    xs = rng.integers(16, 64, 50).astype(np.int32)
    ys = rng.integers(16, 64, 50).astype(np.int32)
    p = np.asarray(patches.gather_patches(img, xs, ys, np.ones(50, bool)))
    m10, m01 = orientation.centroids(p)
    m10, m01 = np.asarray(m10), np.asarray(m01)
    for i in range(50):
        w10, w01 = oracles.centroid(img, int(xs[i]), int(ys[i]))
        assert m10[i] == w10 and m01[i] == w01, (i, m10[i], w10, m01[i], w01)


def test_centroid_saturated_patch():
    # all-255 patch: moments must not overflow (Orb.h:137 unsigned trick)
    img = np.full((64, 64), 255, np.uint8)
    p = np.asarray(patches.gather_patches(
        img, np.array([32], np.int32), np.array([32], np.int32),
        np.ones(1, bool)))
    m10, m01 = orientation.centroids(p)
    w10, w01 = oracles.centroid(img, 32, 32)
    assert int(np.asarray(m10)[0]) == w10 == 0
    assert int(np.asarray(m01)[0]) == w01 == 0


def test_atan2_bins_match_oracle():
    rng = np.random.default_rng(3)
    m10 = rng.integers(-2_000_000, 2_000_000, 500).astype(np.int32)
    m01 = rng.integers(-2_000_000, 2_000_000, 500).astype(np.int32)
    # include axes/diagonals/zeros
    special = np.array(
        [[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1], [5, 5], [-5, 5],
         [5, -5], [-5, -5], [1000000, 1], [1, 1000000]], np.int32)
    m10 = np.concatenate([m10, special[:, 0]])
    m01 = np.concatenate([m01, special[:, 1]])
    got = np.asarray(orientation.atan2_bins(m10, m01))
    for i in range(len(m10)):
        want = oracles.atan2_bin(int(m10[i]), int(m01[i]))
        assert got[i] == want, (i, int(m10[i]), int(m01[i]), got[i], want)


def test_atan2_quadrant_sanity():
    # bin ~ angle/12deg: +x axis -> 0; +y -> 7or8 (90deg=bin7.5); -x -> 15; -y -> 22or23
    def bin_of(x, y):
        return int(np.asarray(orientation.atan2_bins(
            np.array([x], np.int32), np.array([y], np.int32)))[0])

    assert bin_of(1000, 0) == 0
    assert bin_of(0, 1000) in (7, 8)
    assert bin_of(-1000, 0) == 15
    assert bin_of(0, -1000) in (22, 23)
