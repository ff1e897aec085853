"""Stage profile of the on-device pyramid build (tunnel-safe methodology).

Small (sub-ms) ops need LONG chains (the fixed ~30 ms tunnel readback drifts
+-40%, so the hi-lo difference must dominate it) and the lo/hi executables
must be interleaved in one loop with minima compared.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pislam_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from pislam_tpu.config import PyramidConfig
from pislam_tpu.ops.gaussian import gaussian5x5
from pislam_tpu.ops.bilinear import resize_bilinear, bilinear7_8
from pislam_tpu.ops.pyramid import build_pyramid


def xr(o):
    r = jax.lax.reduce(o.astype(jnp.uint32), np.uint32(0),
                       jax.lax.bitwise_xor, tuple(range(o.ndim)))
    return r


def measure(name, op, x0, n_lo=2, n_hi=62, reps=8):
    def make(n):
        @jax.jit
        def f(x):
            o = None
            for _ in range(n):
                o = op(x)
                x = x + (xr(o) & 1).astype(x.dtype)
            return xr(o)
        return f

    f_lo, f_hi = make(n_lo), make(n_hi)

    def once(f):
        t0 = time.perf_counter()
        np.asarray(f(x0))
        return time.perf_counter() - t0

    once(f_lo); once(f_hi)  # warm
    lo, hi = [], []
    for _ in range(reps):
        lo.append(once(f_lo))
        hi.append(once(f_hi))
    per = (min(hi) - min(lo)) / (n_hi - n_lo)
    print(f"{name:36s} {per*1e3:8.4f} ms")
    return per


rng = np.random.default_rng(0)
cfg = PyramidConfig()
frame = jnp.asarray(rng.integers(0, 256, (cfg.base_height, cfg.base_width), np.uint8))

measure("build_pyramid (full, 8 levels)", lambda x: build_pyramid(x, cfg), frame)
measure("gaussian5x5 VGA", gaussian5x5, frame)
measure("resize VGA->533x400", lambda x: resize_bilinear(x, 400, 533), frame)
measure("bilinear7_8 VGA", bilinear7_8, frame)

# --- stacking hypothesis ---
from pislam_tpu.ops.pyramid import stack_levels
from pislam_tpu.config import round_up

sizes = cfg.level_sizes
levels_np = [rng.integers(0, 256, (h, w), np.uint8) for (w, h) in sizes]
levels_j = [jnp.asarray(a) for a in levels_np]

def stack_op(x):
    lv = [levels_j[0] + x[0, 0]] + levels_j[1:]
    return stack_levels(lv, cfg)

measure("stack_levels (pad+concat)", stack_op, jnp.zeros((8, 128), jnp.uint8))

def stack_set(levels, c):
    out = jnp.zeros((c.padded_height, c.stride), jnp.uint8)
    y = 0
    for img, (w, h) in zip(levels, c.level_sizes):
        out = jax.lax.dynamic_update_slice(out, img, (y, 0))
        y += h
    return out

def stack_set_op(x):
    lv = [levels_j[0] + x[0, 0]] + levels_j[1:]
    return stack_set(lv, cfg)

measure("stack_levels (dyn_update_slice)", stack_set_op, jnp.zeros((8, 128), jnp.uint8))

def build2(x):
    out = jnp.zeros((cfg.padded_height, cfg.stride), jnp.uint8)
    out = jax.lax.dynamic_update_slice(out, x, (0, 0))
    y = cfg.base_height
    cur = x
    for lvl in range(1, cfg.num_levels):
        w, h = sizes[lvl]
        cur = resize_bilinear(gaussian5x5(cur), h, w)
        out = jax.lax.dynamic_update_slice(out, cur, (y, 0))
        y += h
    return out

measure("build_pyramid v2 (set-based)", build2, frame)
