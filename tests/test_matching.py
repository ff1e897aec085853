"""Hamming matcher: exactness vs numpy popcount, filters, cross-check."""

import numpy as np

from pislam_tpu import matching


def np_hamming(d1, d2):
    a = np.unpackbits(d1.view(np.uint8), axis=1)
    b = np.unpackbits(d2.view(np.uint8), axis=1)
    return (a[:, None, :] != b[None, :, :]).sum(-1)


def random_desc(k, rng):
    return rng.integers(0, 1 << 32, (k, 8), dtype=np.uint64).astype(np.uint32)


def test_distance_matrix_exact():
    rng = np.random.default_rng(0)
    d1, d2 = random_desc(64, rng), random_desc(96, rng)
    got = np.asarray(matching.hamming_matrix(d1, d2))
    np.testing.assert_array_equal(got, np_hamming(d1, d2))


def test_self_match_identity():
    rng = np.random.default_rng(1)
    d = random_desc(128, rng)
    valid = np.ones(128, bool)
    idx, dist = matching.match(d, d, valid, valid, max_distance=64, ratio=0.99)
    idx = np.asarray(idx)
    assert (idx == np.arange(128)).all()
    assert (np.asarray(dist) == 0).all()


def test_perturbed_match():
    rng = np.random.default_rng(2)
    d1 = random_desc(64, rng)
    d2 = d1.copy()
    # flip 5 random bits in each descriptor of frame 2
    for i in range(64):
        for b in rng.integers(0, 256, 5):
            d2[i, b // 32] ^= np.uint32(1) << (b % 32)
    perm = rng.permutation(64)
    d2 = d2[perm]
    valid = np.ones(64, bool)
    idx, dist = matching.match(d1, d2, valid, valid, max_distance=16, ratio=0.9)
    idx = np.asarray(idx)
    matched = idx >= 0
    assert matched.sum() > 55  # nearly all should survive
    # every match must point at the permuted twin
    want = np.argsort(perm)
    assert (idx[matched] == want[matched]).all()


def test_invalid_never_matches():
    rng = np.random.default_rng(3)
    d1, d2 = random_desc(32, rng), random_desc(32, rng)
    v1 = np.zeros(32, bool)
    idx, _ = matching.match(d1, d2, v1, np.ones(32, bool))
    assert (np.asarray(idx) == -1).all()
    idx, _ = matching.match(d2, d1, np.ones(32, bool), v1)
    assert (np.asarray(idx) == -1).all()


def test_cross_check_rejects_many_to_one():
    # two identical queries against one target: cross-check keeps at most one
    d = random_desc(1, np.random.default_rng(4))
    d1 = np.vstack([d, d])
    idx, _ = matching.match(d1, d, np.ones(2, bool), np.ones(1, bool),
                            max_distance=64, ratio=1.0)
    assert (np.asarray(idx) >= 0).sum() <= 1


def test_match_gated_equivalent_when_gate_open():
    """A gate wider than the scene reproduces ungated matching exactly."""
    rng = np.random.default_rng(9)
    d1, d2 = random_desc(64, rng), random_desc(128, rng)
    v1 = rng.random(64) < 0.9
    v2 = rng.random(128) < 0.9
    uv1 = rng.uniform(-1, 1, (64, 2)).astype(np.float32)
    uv2 = rng.uniform(-1, 1, (128, 2)).astype(np.float32)
    idx_u, dist_u = matching.match(d1, d2, v1, v2, max_distance=80,
                                   ratio=0.9)
    idx_g, dist_g = matching.match_gated(d1, d2, v1, v2, uv1, uv2, 100.0,
                                         max_distance=80, ratio=0.9)
    assert np.array_equal(np.asarray(idx_u), np.asarray(idx_g))
    assert np.array_equal(np.asarray(dist_u), np.asarray(dist_g))


def test_match_gated_resolves_aliased_descriptors():
    """Two landmarks with the SAME descriptor at far-apart locations: the
    ungated ratio test kills the match (best == second), the projection
    gate resolves each query to the nearby copy."""
    rng = np.random.default_rng(10)
    d = random_desc(2, rng)
    db = np.vstack([d[0], d[0]])            # aliased pair
    q = d[0][None]
    v1, v2 = np.ones(1, bool), np.ones(2, bool)
    uvq = np.float32([[0.1, 0.1]])
    uvdb = np.float32([[0.1, 0.1], [0.9, -0.7]])  # copy 0 nearby, copy 1 far

    idx_u, _ = matching.match(q, db, v1, v2, max_distance=64, ratio=0.8,
                              cross_check=False)
    assert int(np.asarray(idx_u)[0]) == -1  # ratio kill: best == second

    idx_g, _ = matching.match_gated(q, db, v1, v2, uvq, uvdb, 0.05,
                                    max_distance=64, ratio=0.8,
                                    cross_check=False)
    assert int(np.asarray(idx_g)[0]) == 0   # gate removes the far alias
