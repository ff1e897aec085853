"""Interleaved A/B: fused upstream kernel with 8 vs 16 output rows/step."""
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


def main():
    cfg, stack_np, mask = load()
    stack = jnp.asarray(stack_np)
    fc = cfg.frontend

    def xru32(o):
        return jax.lax.reduce(o.astype(jnp.uint32), np.uint32(0),
                              jax.lax.bitwise_xor, tuple(range(o.ndim)))

    masks = {n: jnp.asarray(pk.build_mask16(mask, n)) for n in (8, 16, 24, 32)}

    def make_op(nout, with_topk):
        def op(img):
            keys = pk.fused_frontend_keys(
                img, masks[nout], fc.fast_threshold, fc.harris_threshold,
                nout)
            if not with_topk:
                return xru32(pk.reduce_keys_2x(keys))
            codes, valid = nms.select_topk_codes(
                pk.reduce_keys_2x(keys), fc.max_keypoints)
            return xru32(codes) ^ xru32(valid)
        return op

    # correctness on hardware first: same survivor multiset
    k8 = np.asarray(jax.jit(lambda im: pk.reduce_keys_2x(
        pk.fused_frontend_keys(im, masks[8], fc.fast_threshold,
                               fc.harris_threshold, 8)))(stack))
    for n in (16, 24, 32):
        kn = np.asarray(jax.jit(lambda im, n=n: pk.reduce_keys_2x(
            pk.fused_frontend_keys(im, masks[n], fc.fast_threshold,
                                   fc.harris_threshold, n)))(stack))
        assert np.array_equal(np.sort(k8[k8 != 0]), np.sort(kn[kn != 0])), n
    print("8/16/24/32-row survivor sets identical on hardware")

    variants = {
        "rows16+topk": make_op(16, True),
        "rows24+topk": make_op(24, True),
        "rows32+topk": make_op(32, True),
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
        print(f"{k:12s} {per*1e3:7.4f} ms")


if __name__ == "__main__":
    main()
