"""In-context A/B of reduce_keys_2x variants (after the fused upstream)."""
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

import functools

from pislam_tpu.config import PislamConfig
from pislam_tpu.ops import nms, pallas_kernels as pk


def load():
    from PIL import Image
    cfg = PislamConfig()
    pc = cfg.pyramid
    stack = np.zeros((pc.padded_height, pc.stride), np.uint8)
    img = np.asarray(Image.open("/root/reference/demo/input.png").convert("L"))
    stack[: img.shape[0], : img.shape[1]] = img
    mask = np.asarray(nms.make_level_mask(
        pc.level_sizes, pc.level_rows, pc.padded_height, pc.stride,
        cfg.frontend.border))
    return cfg, stack, mask


def reduce_strided(m):
    hm = jnp.maximum(m, jnp.roll(m, -1, axis=1))
    keys = jax.lax.bitcast_convert_type(hm[:, ::2], jnp.uint32)
    return keys ^ jnp.uint32(0x80000000)


@functools.lru_cache(maxsize=4)
def _deint_mat(w):
    d = np.zeros((w, w // 2), np.float32)
    d[np.arange(0, w, 2), np.arange(w // 2)] = 1.0
    return d


def reduce_bf16_quarters(m):
    w = m.shape[1]
    hm = jnp.maximum(m, jnp.roll(m, -1, axis=1))
    hmu = jax.lax.bitcast_convert_type(hm, jnp.uint32)
    deint = jnp.asarray(_deint_mat(w), jnp.bfloat16)
    acc = jnp.zeros((m.shape[0], w // 2), jnp.uint32)
    for sh in (0, 8, 16, 24):
        q = ((hmu >> sh) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
        p = jnp.dot(q, deint, preferred_element_type=jnp.float32)
        acc = acc | (p.astype(jnp.uint32) << sh)
    return acc ^ jnp.uint32(0x80000000)


def main():
    cfg, stack_np, mask = load()
    stack = jnp.asarray(stack_np)
    fc = cfg.frontend
    mask16 = jnp.asarray(pk.build_mask16(mask))

    def xru32(o):
        return jax.lax.reduce(o.astype(jnp.uint32), np.uint32(0),
                              jax.lax.bitwise_xor, tuple(range(o.ndim)))

    def make_op(red):
        def op(img):
            keys = pk.fused_frontend_keys(
                img, mask16, fc.fast_threshold, fc.harris_threshold)
            return xru32(red(keys))
        return op

    variants = {
        "matmul_f32_highest": make_op(pk.reduce_keys_2x),
        "strided_slice": make_op(reduce_strided),
        "bf16_quarters": make_op(reduce_bf16_quarters),
        "raw(no reduce)": make_op(lambda k: k),
    }

    # correctness first (vs the production reduce)
    ref = None
    for name, red in [("matmul", pk.reduce_keys_2x),
                      ("strided", reduce_strided),
                      ("bf16q", reduce_bf16_quarters)]:
        keys = pk.fused_frontend_keys(
            stack, mask16, fc.fast_threshold, fc.harris_threshold)
        out = np.asarray(jax.jit(red)(keys))
        if ref is None:
            ref = out
        else:
            assert np.array_equal(ref, out), f"{name} mismatch"
    print("all reduce variants bit-identical")

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

    chains = {k: (make(op, n_lo), make(op, n_hi))
              for k, op in variants.items()}

    def once(f):
        t0 = time.perf_counter()
        np.asarray(f(stack))
        return time.perf_counter() - t0

    for lo, hi in chains.values():
        once(lo); once(hi)
    times = {k: ([], []) for k in chains}
    for _ in range(int(os.environ.get("AB_REPS", "16"))):
        for k, (lo, hi) in chains.items():
            times[k][0].append(once(lo))
            times[k][1].append(once(hi))
    for k, (lo_t, hi_t) in times.items():
        per = (min(hi_t) - min(lo_t)) / (n_hi - n_lo)
        print(f"{k:20s} {per*1e3:7.4f} ms")


if __name__ == "__main__":
    main()
