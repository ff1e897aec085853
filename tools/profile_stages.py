"""In-context stage budget of the production (fused+pallas) frontend.

Truncated-pipeline variants, all interleaved in one process; adjacent
differences give per-stage in-context costs:

  upstream_raw   fused_frontend_keys only
  upstream       + reduce_keys_2x
  topk           + select_topk_codes
  gather         + gather_windows_packed
  full           + orb_select (moments+atan2+BRIEF) + packing
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
from pislam_tpu.frontend import _extract_impl
from pislam_tpu.ops import nms, patches, pallas_kernels as pk
from pislam_tpu.utils import codec


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


def xru32(o):
    return jax.lax.reduce(o.astype(jnp.uint32), np.uint32(0),
                          jax.lax.bitwise_xor, tuple(range(o.ndim)))


def main():
    cfg, stack_np, mask = load()
    stack = jnp.asarray(stack_np)
    fc = cfg.frontend
    mask16 = jnp.asarray(pk.build_mask16(mask))

    def upstream_raw(img):
        return xru32(pk.fused_frontend_keys(
            img, mask16, fc.fast_threshold, fc.harris_threshold))

    def upstream(img):
        keys = pk.fused_frontend_keys(
            img, mask16, fc.fast_threshold, fc.harris_threshold)
        return xru32(pk.reduce_keys_2x(keys))

    def topk(img):
        keys = pk.fused_frontend_keys(
            img, mask16, fc.fast_threshold, fc.harris_threshold)
        codes, valid = nms.select_topk_codes(
            pk.reduce_keys_2x(keys), fc.max_keypoints)
        return xru32(codes) ^ xru32(valid)

    def gather(img):
        keys = pk.fused_frontend_keys(
            img, mask16, fc.fast_threshold, fc.harris_threshold)
        codes, valid = nms.select_topk_codes(
            pk.reduce_keys_2x(keys), fc.max_keypoints)
        xs = codec.decode_x(codes).astype(jnp.int32)
        ys = codec.decode_y(codes).astype(jnp.int32)
        flat = patches.gather_patches_packed_s8(img, xs, ys, valid)
        return xru32(jax.lax.bitcast_convert_type(
            flat.reshape(flat.shape[0], 256, 4), jnp.uint32)) ^ xru32(codes)

    def full(img):
        feats = _extract_impl(img, mask, cfg)
        return xru32(feats.descriptors) ^ feats.codes[0]

    stages = [("upstream_raw", upstream_raw), ("upstream", upstream),
              ("topk", topk), ("gather", gather), ("full", full)]

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

    chains = {k: (make(op, n_lo), make(op, n_hi)) for k, op in stages}

    def once(f):
        t0 = time.perf_counter()
        np.asarray(f(stack))
        return time.perf_counter() - t0

    for lo, hi in chains.values():
        once(lo); once(hi)

    times = {k: ([], []) for k, _ in stages}
    for _ in range(int(os.environ.get("AB_REPS", "20"))):
        for k, (lo, hi) in chains.items():
            times[k][0].append(once(lo))
            times[k][1].append(once(hi))
    prev = 0.0
    for k, _ in stages:
        lo_t, hi_t = times[k]
        per = (min(hi_t) - min(lo_t)) / (n_hi - n_lo)
        print(f"{k:14s} {per*1e3:7.4f} ms  (+{(per-prev)*1e3:7.4f})")
        prev = per


if __name__ == "__main__":
    main()
