"""Hardware parity check: Pallas fast path vs pure-XLA fallback, bit-exact.

Run on the real TPU (default env). Asserts that the full frontend with the
Pallas kernels produces byte-identical Features to the XLA fallback path on
the reference demo pyramid, then prints in-jit chain timings for both.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from pislam_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

sys.path.insert(0, os.path.dirname(__file__))
from tpu_timeit import timeit_chain  # noqa: E402

from pislam_tpu.config import PislamConfig  # noqa: E402
from pislam_tpu.ops import (brief, fast, harris, nms, orientation,  # noqa: E402
                            patches)
from pislam_tpu.utils import codec  # noqa: E402


def load_stack(cfg):
    from PIL import Image
    pc = cfg.pyramid
    stack = np.zeros((pc.padded_height, pc.stride), np.uint8)
    img = np.asarray(Image.open("/root/reference/demo/input.png").convert("L"))
    stack[: img.shape[0], : img.shape[1]] = img
    return stack


def main():
    cfg = PislamConfig()
    fc, pc = cfg.frontend, cfg.pyramid
    stack = jnp.asarray(load_stack(cfg))
    mask = jnp.asarray(nms.make_level_mask(
        pc.level_sizes, pc.level_rows, pc.padded_height, pc.stride,
        fc.border))

    def upstream(img):
        corner = fast.fast_detect(img, fc.fast_threshold)
        score = harris.harris_score(img, fc.harris_threshold, mask=corner)
        score = jnp.where(mask, score, jnp.uint8(0))
        keep = nms.nms(score)
        return jnp.where(keep, score, jnp.uint8(0))

    def tail(img, codes, valid, packed: bool):
        xs = codec.decode_x(codes).astype(jnp.int32)
        ys = codec.decode_y(codes).astype(jnp.int32)
        if packed:
            flat = patches.gather_patches_packed_s8(img, xs, ys, valid)
            m10, m01 = orientation.centroids_packed(flat)
            ang = orientation.atan2_bins(m10, m01)
            desc = brief.describe_packed(flat, ang, fc.words)
        else:
            p = patches.gather_patches_s8(img, xs, ys, valid)
            m10, m01 = orientation.centroids(p)
            ang = orientation.atan2_bins(m10, m01)
            desc = brief.describe(p, ang, fc.words)
        return jnp.where(valid[:, None], desc, jnp.uint32(0))

    def full_fast(img):
        scored = upstream(img)
        codes, valid = nms.select_topk_scored(scored, fc.max_keypoints)
        return codes, tail(img, codes, valid, packed=True)

    def full_xla(img):
        scored = upstream(img)
        enc = nms.encode_grid(scored, scored > 0)
        codes, valid = nms.select_topk(enc, fc.max_keypoints)
        return codes, tail(img, codes, valid, packed=False)

    cf, df = jax.jit(full_fast)(stack)
    cx, dx = jax.jit(full_xla)(stack)
    cf, df, cx, dx = map(np.asarray, (cf, df, cx, dx))
    assert np.array_equal(cf, cx), "keypoint codes diverge"
    assert np.array_equal(df, dx), f"descriptors diverge ({(df != dx).sum()} words)"

    # the production path and the experimental fused-upstream path too
    import dataclasses
    from pislam_tpu.frontend import _extract_impl
    mask_np = np.asarray(mask) > 0  # concrete: bakes into the executable
    for fused in (False, True):
        c2 = dataclasses.replace(
            cfg, frontend=dataclasses.replace(fc, fused_upstream=fused))
        feats = jax.jit(lambda im, c2=c2: _extract_impl(im, mask_np, c2))(stack)
        tag = "fused-upstream" if fused else "production"
        assert np.array_equal(np.asarray(feats.codes), cx), f"{tag} codes diverge"
        assert np.array_equal(np.asarray(feats.descriptors), dx), (
            f"{tag} descriptors diverge")
    # sorted-BRIEF production pipeline: same features bit-for-bit
    c2 = dataclasses.replace(
        cfg, frontend=dataclasses.replace(fc, fused_upstream=True,
                                          brief_variant="sorted"))
    feats = jax.jit(lambda im, c2=c2: _extract_impl(im, mask_np, c2))(stack)
    assert np.array_equal(np.asarray(feats.codes), cx), (
        "sorted-brief codes diverge")
    assert np.array_equal(np.asarray(feats.descriptors), dx), (
        "sorted-brief descriptors diverge")

    # bucketed config: the fused path buckets the 2x2-reduced code grid
    # (halved geometry); must match the XLA grid bucketing feature-for-
    # feature (Fast.h:316-341 semantics)
    for lbs, lim in ((4, 5), (3, 2)):
        outs = []
        for fused in (False, True):
            c2 = dataclasses.replace(
                cfg, frontend=dataclasses.replace(
                    fc, fused_upstream=fused, log_bucket_size=lbs,
                    bucket_limit=lim))
            f = jax.jit(lambda im, c2=c2: _extract_impl(im, mask_np, c2))(stack)
            outs.append((np.asarray(f.codes), np.asarray(f.descriptors)))
        assert np.array_equal(outs[0][0], outs[1][0]), (
            f"bucketed codes diverge (lbs={lbs}, limit={lim})")
        assert np.array_equal(outs[0][1], outs[1][1]), (
            f"bucketed descriptors diverge (lbs={lbs}, limit={lim})")

    # angle-sorted rotation-skip kernel == dense 30-dot kernel on hardware
    from pislam_tpu.ops import pallas_kernels as pk

    def flat_windows(img):
        scored = upstream(img)
        codes, valid = nms.select_topk_scored(scored, fc.max_keypoints)
        return patches.gather_patches_packed_s8(
            img, codec.decode_x(codes).astype(jnp.int32),
            codec.decode_y(codes).astype(jnp.int32), valid)

    flat = jax.jit(flat_windows)(stack)
    gm = jnp.asarray(brief._gm_packed())
    a0, b0 = jax.jit(pk.orb_select_bits)(flat, gm)
    a1, b1 = jax.jit(pk.orb_select_bits_sorted)(flat, gm)
    assert np.array_equal(np.asarray(a0).ravel(), np.asarray(a1).ravel()), (
        "angle-sorted kernel: angles diverge")
    assert np.array_equal(np.asarray(b0), np.asarray(b1)), (
        "angle-sorted kernel: descriptor bits diverge")

    # gated + ungated fused matcher vs the XLA dense-matrix reductions on
    # hardware, with REAL demo descriptors (not synthetic noise): the
    # production map-tracking config (gate_radius > 0) runs the gated
    # kernel branch of matching.match_gated
    from pislam_tpu import matching

    rng = np.random.default_rng(7)
    k = fc.max_keypoints
    valid_q = cx != 0
    uv_q = np.stack([codec.decode_x(jnp.asarray(cx)),
                     codec.decode_y(jnp.asarray(cx))], 1).astype(np.float32)
    uv_q = uv_q / np.float32([pc.stride, pc.padded_height]) - 0.5
    perm = rng.permutation(k)
    db, uv_db, valid_db = dx[perm], uv_q[perm] + rng.normal(
        0, 0.02, (k, 2)).astype(np.float32), valid_q[perm]
    for radius in (None, 0.06):
        a = matching.expand_pm1(jnp.asarray(dx))
        b = matching.expand_pm1(jnp.asarray(db))
        args = (a, b, jnp.asarray(valid_q), jnp.asarray(valid_db))
        if radius is not None:
            args += (jnp.asarray(uv_q), jnp.asarray(uv_db), radius)
        best, second, idx, carg = map(np.asarray, jax.jit(
            pk.match_reduce, static_argnames=("radius",))(*args))
        dist = matching.hamming_matrix(
            jnp.asarray(dx), jnp.asarray(db),
            jnp.asarray(valid_q), jnp.asarray(valid_db))
        if radius is not None:
            d2 = jnp.sum((jnp.asarray(uv_q)[:, None, :]
                          - jnp.asarray(uv_db)[None, :, :]) ** 2, axis=-1)
            dist = jnp.where(d2 <= radius * radius, dist, matching.MAX_DIST)
        eidx, ebest, esecond = matching._best_two(dist)
        ecarg = jnp.argmin(dist, axis=0)
        tag = "ungated" if radius is None else f"gated(r={radius})"
        assert np.array_equal(best, np.asarray(ebest)), f"{tag} best diverge"
        assert np.array_equal(second, np.asarray(esecond)), (
            f"{tag} second diverge")
        assert np.array_equal(idx, np.asarray(eidx)), f"{tag} idx diverge"
        assert np.array_equal(carg, np.asarray(ecarg)), f"{tag} carg diverge"

    print(f"parity OK: {int((cf != 0).sum())} features, descriptors bit-exact"
          " (pallas components, XLA fallback, production, fused, bucketed-"
          "fused, angle-sorted-ORB and gated/ungated match-reduce paths)")

    # xor-reduce over ALL descriptor words: a single-element probe would let
    # XLA slice the BRIEF matmul down to one row in intermediate iterations
    u32 = lambda o: o[0][0] ^ jax.lax.reduce(
        o[1], np.uint32(0), jax.lax.bitwise_xor, (0, 1))
    t_fast = timeit_chain(full_fast, stack, u32)
    t_xla = timeit_chain(full_xla, stack, u32)
    print(f"pallas path: {t_fast*1e3:.3f} ms/frame ({1/t_fast:.0f} fps)")
    print(f"xla path   : {t_xla*1e3:.3f} ms/frame ({1/t_xla:.0f} fps)")


if __name__ == "__main__":
    main()
