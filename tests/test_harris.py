"""Dense Harris scoring vs the literal per-candidate oracle
(exact integer semantics incl. quarter-float encoding)."""

import numpy as np
import pytest

import oracles
from pislam_tpu.ops.harris import harris_score, harris_response, quarter_float

BORDER = 4


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dense_vs_oracle(seed):
    img = oracles.make_test_image(40, 48, seed=seed)
    threshold = 1 << 10
    got = np.asarray(harris_score(img, threshold))
    b = BORDER
    for y in range(b, 40 - b, 3):
        for x in range(b, 48 - b, 3):
            want = oracles.harris_score_at(img, x, y, threshold)
            assert got[y, x] == want, (x, y, got[y, x], want)


def test_noise_extremes():
    rng = np.random.default_rng(9)
    img = (rng.integers(0, 2, (32, 32)) * 255).astype(np.uint8)  # harsh checker noise
    threshold = 1 << 15
    got = np.asarray(harris_score(img, threshold))
    b = BORDER
    for y in range(b, 32 - b, 2):
        for x in range(b, 32 - b, 2):
            want = oracles.harris_score_at(img, x, y, threshold)
            assert got[y, x] == want, (x, y, got[y, x], want)


def test_quarter_float_monotone_on_demo_range():
    # scores above the demo threshold (1<<15) up to 2^30 must sort correctly
    scores = np.unique(np.logspace(15.1, 30, 200, base=2).astype(np.int64))
    qf = np.asarray(quarter_float(scores.astype(np.int32)))
    assert (np.diff(qf.astype(np.int32)) >= 0).all()
