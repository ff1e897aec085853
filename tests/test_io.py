"""Native PNG I/O + prefetching frame streamer."""

import os

import numpy as np
import pytest

from pislam_tpu.io import native


def test_native_lib_builds():
    assert native.get_lib() is not None, "native libpislam_io failed to build"


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64), np.uint8)
    p = str(tmp_path / "x.png")
    native.write_png(p, img)
    back = native.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_read_reference_demo_png():
    path = "/root/reference/demo/input.png"
    if not os.path.exists(path):
        pytest.skip("reference demo asset not present")
    img = native.read_png(path)
    assert img.shape == (2210, 640)
    assert img.dtype == np.uint8
    assert 10 < img.mean() < 245


def test_frame_stream(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    imgs = []
    for i in range(10):
        img = rng.integers(0, 256, (32, 40), np.uint8)
        p = str(tmp_path / f"f{i:03d}.png")
        native.write_png(p, img)
        paths.append(p)
        imgs.append(img)
    stream = native.FrameStream(paths, width=40, height=32, capacity=3)
    got = list(stream)
    assert len(got) == 10
    for a, b in zip(got, imgs):
        np.testing.assert_array_equal(a, b)
    stream.close()


def test_frame_stream_size_mismatch(tmp_path):
    img = np.zeros((8, 8), np.uint8)
    p = str(tmp_path / "bad.png")
    native.write_png(p, img)
    stream = native.FrameStream([p], width=40, height=32)
    with pytest.raises((IOError, StopIteration)):
        next(stream)
    stream.close()
