"""Rotated BRIEF descriptors vs the literal float32-rotation oracle."""

import numpy as np

import oracles
from pislam_tpu.ops import brief, patches


def test_all_rotations_match_oracle():
    img = oracles.make_test_image(80, 80, seed=4)
    xs = np.full(30, 40, np.int32)
    ys = np.full(30, 40, np.int32)
    angles = np.arange(30, dtype=np.uint8)
    p = np.asarray(patches.gather_patches(img, xs, ys, np.ones(30, bool)))
    got = np.asarray(brief.describe(p, angles, words=8))
    for rot in range(30):
        want = oracles.brief_describe(img, 40, 40, rot, words=8)
        assert got[rot].tolist() == [w & 0xFFFFFFFF for w in want], rot


def test_random_keypoints_rot0_and_words():
    img = oracles.make_test_image(96, 96, seed=5)
    rng = np.random.default_rng(6)
    k = 40
    xs = rng.integers(16, 80, k).astype(np.int32)
    ys = rng.integers(16, 80, k).astype(np.int32)
    angles = rng.integers(0, 30, k).astype(np.uint8)
    p = np.asarray(patches.gather_patches(img, xs, ys, np.ones(k, bool)))
    got = np.asarray(brief.describe(p, angles, words=4))
    for i in range(k):
        want = oracles.brief_describe(img, int(xs[i]), int(ys[i]),
                                      int(angles[i]), words=4)
        assert got[i].tolist() == [w & 0xFFFFFFFF for w in want], i


def test_rotation_table_in_bounds():
    assert brief.IDX0.min() >= 0 and brief.IDX0.max() < 31 * 31
    assert brief.IDX1.min() >= 0 and brief.IDX1.max() < 31 * 31
