"""Interleaved A/B decomposition of the window-gather stage.

Historical verdict recorded here: an "8-pack" gather variant (2 gathered
2048-lane rows per keypoint instead of NR=9 256-lane rows) measured ~5x
slower end-to-end -- its realign kernel's wide-lane pltpu.roll rounds cost
~0.6 ms, dwarfing the 16 ns/row gather savings. The production path stays
NR=9. The strips8 variants below remain measurable for reference.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pislam_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pislam_tpu.config import PislamConfig
from pislam_tpu.ops import pallas_kernels as pk

RADIUS = pk.RADIUS


def load():
    from PIL import Image
    cfg = PislamConfig()
    pc = cfg.pyramid
    stack = np.zeros((pc.padded_height, pc.stride), np.uint8)
    img = np.asarray(Image.open("/root/reference/demo/input.png").convert("L"))
    stack[: img.shape[0], : img.shape[1]] = img
    return cfg, stack


def main():
    cfg, stack_np = load()
    stack = jnp.asarray(stack_np)
    h, w = stack.shape
    k = cfg.frontend.max_keypoints
    rng = np.random.default_rng(5)
    xs = jnp.asarray(rng.integers(16, w - 17, k).astype(np.int32))
    ys = jnp.asarray(rng.integers(16, h - 17, k).astype(np.int32))
    valid = jnp.asarray(np.ones(k, bool))

    h4 = h // 4
    h8 = -(-h4 // 8)
    ns = pk.num_strips(w)

    def xru32(o):
        return jax.lax.reduce(o.astype(jnp.uint32), np.uint32(0),
                              jax.lax.bitwise_xor, tuple(range(o.ndim)))

    def strips8_of(img):
        strips = pk.pack_row_strips(img)
        if h8 * 8 != h4:
            strips = jnp.pad(strips, ((0, 0), (0, h8 * 8 - h4), (0, 0)))
        return strips.reshape(ns * h8, 2048)

    def v_full(img):
        return xru32(jax.lax.bitcast_convert_type(
            pk.gather_windows_packed(img, xs, ys, valid)
            .reshape(k, 256, 4), jnp.uint32))

    def v_strips_only(img):
        return xru32(strips8_of(img))

    def v_take_only(img):
        strips8 = strips8_of(img)
        base = (jnp.clip(xs - RADIUS, 0, None) >> 7) * h8 \
            + (((ys - RADIUS) >> 2) >> 3)
        ridx = base[:, None] + jnp.arange(2, dtype=jnp.int32)[None, :]
        rows = jnp.take(strips8, ridx.reshape(-1), axis=0)
        return xru32(rows)

    def v_strips_nr9_only(img):
        return xru32(pk.pack_row_strips(img))

    variants = {
        "full": v_full,
        "strips8_relayout": v_strips_only,
        "strips8+take2": v_take_only,
        "strips_only": v_strips_nr9_only,
    }

    n_lo, n_hi = 2, 12

    def make(op, n):
        @jax.jit
        def f(img):
            o = None
            for _ in range(n):
                o = op(img)
                img = img + (o & 1).astype(jnp.uint8)
            return o
        return f

    chains = {kk: (make(op, n_lo), make(op, n_hi))
              for kk, op in variants.items()}

    def once(f):
        t0 = time.perf_counter()
        np.asarray(f(stack))
        return time.perf_counter() - t0

    for lo, hi in chains.values():
        once(lo); once(hi)
    times = {kk: ([], []) for kk in chains}
    for _ in range(int(os.environ.get("AB_REPS", "16"))):
        for kk, (lo, hi) in chains.items():
            times[kk][0].append(once(lo))
            times[kk][1].append(once(hi))
    for kk, (lo_t, hi_t) in times.items():
        per = (min(hi_t) - min(lo_t)) / (n_hi - n_lo)
        print(f"{kk:18s} {per*1e3:7.4f} ms")


if __name__ == "__main__":
    main()
