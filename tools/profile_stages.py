"""Stage-level profiling of the extraction frontend on the real TPU.

Chain-timing methodology per .claude/skills/verify/SKILL.md: feed a zeroed
scalar of iteration i's output back into iteration i+1's input, one readback,
difference two chain lengths.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pislam_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pislam_tpu.config import PislamConfig
from pislam_tpu.ops import fast, harris, nms, patches, orientation, brief
from pislam_tpu.utils import codec


def load_stack(cfg):
    pc = cfg.pyramid
    stack = np.zeros((pc.padded_height, pc.stride), np.uint8)
    from PIL import Image
    img = np.asarray(Image.open("/root/reference/demo/input.png").convert("L"))
    stack[: img.shape[0], : img.shape[1]] = img
    return stack


def time_fn(f, img0, out_scalar, n1=10, n2=60, reps=3):
    """f: img -> out; out_scalar: out -> uint32-ish scalar array for chaining."""
    f = jax.jit(f)

    @jax.jit
    def feed(o):
        return img0 + (out_scalar(o) & jnp.uint32(0)).astype(jnp.uint8)

    def chain(n):
        s = img0
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = f(s)
            s = feed(o)
        np.asarray(out_scalar(o))
        return time.perf_counter() - t0

    chain(3)
    best = min((chain(n2) - chain(n1)) / (n2 - n1) for _ in range(reps))
    return best


def main():
    cfg = PislamConfig()
    fc = cfg.frontend
    pc = cfg.pyramid
    stack = jnp.asarray(load_stack(cfg))
    mask = jnp.asarray(nms.make_level_mask(
        pc.level_sizes, pc.level_rows, pc.padded_height, pc.stride, fc.border))

    stages = {}

    # stage 0: dispatch floor (trivial kernel)
    def s_null(img):
        return img[:8, :128].astype(jnp.uint32)
    stages["null"] = time_fn(s_null, stack, lambda o: o[0, 0])

    # stage 1: FAST
    def s_fast(img):
        return fast.fast_detect(img, fc.fast_threshold)
    stages["fast"] = time_fn(s_fast, stack, lambda o: o[0, 0].astype(jnp.uint32))

    # stage 2: FAST + harris
    def s_harris(img):
        corner = fast.fast_detect(img, fc.fast_threshold)
        return harris.harris_score(img, fc.harris_threshold, mask=corner)
    stages["fast+harris"] = time_fn(s_harris, stack, lambda o: o[0, 0].astype(jnp.uint32))

    # stage 3: + nms + encode
    def s_nms(img):
        score = s_harris(img)
        score = jnp.where(mask, score, jnp.uint8(0))
        keep = nms.nms(score)
        return nms.encode_grid(score, keep)
    stages["+nms+encode"] = time_fn(s_nms, stack, lambda o: o[0, 0])

    # stage 4: + topk
    def s_topk(img):
        enc = s_nms(img)
        codes, valid = nms.select_topk(enc, fc.max_keypoints)
        return codes
    stages["+topk"] = time_fn(s_topk, stack, lambda o: o[0])

    # stage 5: + patch gather
    def s_patch(img):
        enc = s_nms(img)
        codes, valid = nms.select_topk(enc, fc.max_keypoints)
        xs = codec.decode_x(codes).astype(jnp.int32)
        ys = codec.decode_y(codes).astype(jnp.int32)
        p = patches.gather_patches_s8(img, xs, ys, valid)
        return p
    stages["+patches"] = time_fn(s_patch, stack, lambda o: o[0, 0, 0].astype(jnp.uint32))

    # stage 6: + orientation
    def s_orient(img):
        enc = s_nms(img)
        codes, valid = nms.select_topk(enc, fc.max_keypoints)
        xs = codec.decode_x(codes).astype(jnp.int32)
        ys = codec.decode_y(codes).astype(jnp.int32)
        p = patches.gather_patches_s8(img, xs, ys, valid)
        m10, m01 = orientation.centroids(p)
        return orientation.atan2_bins(m10, m01)
    stages["+orientation"] = time_fn(s_orient, stack, lambda o: o[0].astype(jnp.uint32))

    # stage 7: full (+ brief)
    def s_full(img):
        enc = s_nms(img)
        codes, valid = nms.select_topk(enc, fc.max_keypoints)
        xs = codec.decode_x(codes).astype(jnp.int32)
        ys = codec.decode_y(codes).astype(jnp.int32)
        p = patches.gather_patches_s8(img, xs, ys, valid)
        m10, m01 = orientation.centroids(p)
        ang = orientation.atan2_bins(m10, m01)
        return brief.describe(p, ang, fc.words)
    stages["full"] = time_fn(s_full, stack, lambda o: o[0, 0])

    prev = 0.0
    for name, t in stages.items():
        print(f"{name:16s} cumulative {t*1e3:7.3f} ms   delta {(t-prev)*1e3:7.3f} ms")
        prev = t


if __name__ == "__main__":
    main()
