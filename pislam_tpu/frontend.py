"""The ORB extraction frontend: one jitted pass over a stacked pyramid.

End-to-end equivalent of the reference demo's per-frame path (demo.cpp:78-101
-> SURVEY.md section 3.1): per-level fastDetect + fastScoreHarris +
fastExtract, then one whole-pyramid orbCompute. Here the per-level loops
vanish: FAST, Harris and NMS run as dense passes over the *entire* stacked
(total_height, stride) buffer at once, and per-level borders become a single
precomputed validity mask. Keypoint y coordinates are global pyramid rows,
exactly like the demo's re-encoding (demo.cpp:92-97).

Output is a fixed-capacity Features batch (static shapes for XLA):

    codes       (K,)  uint32  score<<24 | x<<12 | y (Util.h:27)
    valid       (K,)  bool
    angles      (K,)  uint8   orientation bin in [0, 30)
    descriptors (K, words) uint32

Keypoints are strongest-first by (score, x, y).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import PislamConfig
from .ops import brief, fast, harris, nms, patches
from .utils import codec


class Features(NamedTuple):
    codes: jax.Array        # (K,) uint32
    valid: jax.Array        # (K,) bool
    angles: jax.Array       # (K,) uint8
    descriptors: jax.Array  # (K, words) uint32

    @property
    def xs(self):
        return codec.decode_x(self.codes).astype(jnp.int32)

    @property
    def ys(self):
        return codec.decode_y(self.codes).astype(jnp.int32)

    @property
    def scores(self):
        return codec.decode_score(self.codes).astype(jnp.int32)

    @property
    def num_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def _extract_impl(img, level_mask, cfg: PislamConfig) -> Features:
    from .ops import pallas_kernels as pk

    fc = cfg.frontend
    # level_mask must be CONCRETE (numpy): it is static config data that
    # bakes into the executable (the fused path's mask16 relayout costs
    # ~0.6 ms per frame if computed with traced ops)
    level_mask = np.asarray(level_mask)
    if (fc.fused_upstream and pk.available(img.shape)
            and (fc.log_bucket_size == 0 or fc.border % 2 == 0)):
        # fused Pallas pass: FAST + Harris + mask + NMS + encode + 2x2
        # merge; 16 output rows per grid step (vs 8) re-fetches each image
        # row 2x instead of 3x and halves grid overhead: -24% in-context
        # (tools/ab_fused_rows.py), survivor-set identical
        keys = pk.fused_frontend_keys(
            img, jnp.asarray(pk.build_mask16(level_mask, pk.FUSED_NOUT)),
            fc.fast_threshold, fc.harris_threshold, pk.FUSED_NOUT)
        reduced = pk.reduce_keys_2x(keys)
        if fc.log_bucket_size > 0:
            # bucketing ON the 2x2-reduced code grid, exactly: after the
            # un-permute below, reduced[r,c] is the sole NMS survivor of
            # grid block (2r..2r+1, 2c..2c+1) (3x3 NMS leaves <=1 per
            # block), and with an even border every block lies whole inside
            # one bucket cell, so bucket_topk with halved border/cell
            # geometry caps the same cells on 4x fewer entries
            # (Fast.h:316-341 semantics via nms.bucket_topk).
            # Cells of (bs/2)^2 reduced entries can't exceed the cap ->
            # bucketing is a no-op there, skip it.
            if fc.bucket_limit < (1 << (fc.log_bucket_size - 1)) ** 2:
                # fused_frontend_keys emits each nout-row block's merged
                # pairs as 2 planes (even pairs, then odd pairs) -- a row
                # PERMUTATION top_k is blind to, but bucket_topk is not:
                # with bucket cells smaller than the nout/2-row permutation
                # block (log_bucket_size < 5 here), cell membership would
                # be wrong (caught by tools/tpu_parity.py at lbs=3).
                # Restore true y//2 row order first (cheap relayout, only
                # in bucketed configs).
                nv = pk.FUSED_NOUT // 4
                R, W = reduced.shape
                reduced = (reduced.reshape(R // (2 * nv), 2, nv, W)
                           .transpose(0, 2, 1, 3).reshape(R, W))
                reduced = nms.bucket_topk(
                    reduced, fc.border // 2, fc.log_bucket_size - 1,
                    fc.bucket_limit)
        codes, valid = nms.select_topk_codes(reduced, fc.max_keypoints)
    else:
        corner = fast.fast_detect(img, fc.fast_threshold)
        score = harris.harris_score(img, fc.harris_threshold, mask=corner)
        score = jnp.where(level_mask, score, jnp.uint8(0))
        keep = nms.nms(score)
        if fc.log_bucket_size > 0:
            enc = nms.encode_grid(score, keep)
            enc = nms.bucket_topk(enc, fc.border, fc.log_bucket_size,
                                  fc.bucket_limit)
            # bucket survivors are a subset of NMS survivors, so the fast
            # 2x2-reduction selector still applies to their score grid
            scored = (enc >> 24).astype(jnp.uint8)
        else:
            scored = jnp.where(keep, score, jnp.uint8(0))
        codes, valid = nms.select_topk_scored(scored, fc.max_keypoints)

    xs = codec.decode_x(codes).astype(jnp.int32)
    ys = codec.decode_y(codes).astype(jnp.int32)
    flat = patches.gather_patches_packed_s8(img, xs, ys, valid)
    angles, desc = brief.orb_compute_packed(flat, fc.words,
                                            variant=fc.brief_variant)
    desc = jnp.where(valid[:, None], desc, jnp.uint32(0))
    angles = jnp.where(valid, angles, jnp.uint8(0))
    return Features(codes=codes, valid=valid, angles=angles, descriptors=desc)


def make_extract_fn(cfg: PislamConfig):
    """Build a jitted extract(pyramid_stacked) -> Features for a config.

    ``pyramid_stacked`` is (padded_height, stride) uint8: the vertically
    stacked pyramid (README.md:56-83 layout). The per-level border validity
    mask is baked in as a compile-time constant.
    """
    pc = cfg.pyramid
    mask = nms.make_level_mask(
        pc.level_sizes, pc.level_rows, pc.padded_height, pc.stride,
        cfg.frontend.border,
    )

    @jax.jit
    def extract(img):
        assert img.shape == (pc.padded_height, pc.stride), (
            f"expected {(pc.padded_height, pc.stride)}, got {img.shape}"
        )
        return _extract_impl(img, mask, cfg)

    return extract


def extract_single_level(img, cfg: PislamConfig) -> Features:
    """Extraction over one plain (H, W) image (no pyramid): test/VO helper.

    The image is zero-padded to the lane/sublane alignment the Pallas fast
    path needs (width to a multiple of 128, height to a multiple of 8); the
    validity mask keeps the original border, so the padding never changes
    which features are found (all reads from a valid keypoint stay >= 16
    pixels inside the original image).
    """
    from .config import round_up

    h, w = img.shape
    b = cfg.frontend.border
    ph, pw = round_up(h, 8), max(round_up(w, 128), 256)
    if (ph, pw) != (h, w):
        img = jnp.pad(img, ((0, ph - h), (0, pw - w)))
    m = np.zeros((ph, pw), bool)
    m[b:h - b, b:w - b] = True
    return _extract_impl(img, m, cfg)
