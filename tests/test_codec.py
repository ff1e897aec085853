import numpy as np

from pislam_tpu.utils import codec


def test_roundtrip():
    rng = np.random.default_rng(0)
    score = rng.integers(0, 256, 1000)
    x = rng.integers(0, 4096, 1000)
    y = rng.integers(0, 4096, 1000)
    enc = np.asarray(codec.encode(score, x, y))
    assert np.array_equal(np.asarray(codec.decode_score(enc)), score)
    assert np.array_equal(np.asarray(codec.decode_x(enc)), x)
    assert np.array_equal(np.asarray(codec.decode_y(enc)), y)


def test_score_major_order():
    # integer order == (score, x, y) lexicographic order (Util.h packing)
    a = np.asarray(codec.encode(10, 100, 100))
    b = np.asarray(codec.encode(11, 0, 0))
    c = np.asarray(codec.encode(10, 101, 0))
    assert a < b and a < c


def test_reencode():
    enc = np.asarray(codec.encode(5, 7, 9))
    re = np.asarray(codec.reencode_score(200, enc))
    assert np.asarray(codec.decode_score(re)) == 200
    assert np.asarray(codec.decode_x(re)) == 7
    assert np.asarray(codec.decode_y(re)) == 9
