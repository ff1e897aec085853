"""Pyramid builder: geometry matches the demo level table; fast chain uses
the byte-exact kernels."""

import numpy as np

import oracles
from pislam_tpu.config import PyramidConfig
from pislam_tpu.ops import pyramid


def test_demo_level_table():
    cfg = PyramidConfig()
    # reference demo.cpp:38-47 hardcoded table
    assert cfg.level_sizes == (
        (640, 480), (533, 400), (444, 333), (370, 278),
        (309, 231), (257, 193), (214, 161), (179, 134),
    )
    assert cfg.total_height == 2210
    assert cfg.level_rows == (0, 480, 880, 1213, 1491, 1722, 1915, 2076)


def test_build_pyramid_shapes():
    cfg = PyramidConfig(base_width=96, base_height=80, num_levels=3)
    frame = oracles.make_test_image(80, 96, seed=0)
    stack = np.asarray(pyramid.build_pyramid(frame, cfg))
    assert stack.shape == (cfg.padded_height, cfg.stride)
    # level 0 is the raw frame
    np.testing.assert_array_equal(stack[:80, :96], frame)
    # level 1 region is nonzero (blur+resize ran), padding is zero
    (w1, h1) = cfg.level_sizes[1]
    assert stack[80:80 + h1, :w1].any()
    np.testing.assert_array_equal(stack[:80, 96:], 0)


def test_build_pyramid_fast_uses_exact_kernels():
    cfg = PyramidConfig(base_width=128, base_height=96, num_levels=3)
    frame = oracles.make_test_image(96, 128, seed=1)
    stack, sizes = pyramid.build_pyramid_fast(frame, cfg)
    stack = np.asarray(stack)
    assert sizes[0] == (128, 96)
    # verify level 1 against oracle chain: blur then the planned ratio
    plan = pyramid.plan_fast_chain(cfg)
    kind, (w1, h1) = plan[1]
    blurred = oracles.gaussian5x5(frame)
    want = (oracles.bilinear7_8(blurred) if kind == "7/8"
            else oracles.bilinear13_16(blurred))[:h1, :w1]
    got = stack[96:96 + h1, :w1]
    np.testing.assert_array_equal(got, want)
