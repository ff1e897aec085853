"""Interleaved A/B: dense 30-dot rotation-select vs the angle-sorted kernel.

VERDICT round-1 weak #7 / next #10: the fused BRIEF kernel runs all 30
rotation matmuls per 256-keypoint block and selects one (~30x MXU
over-work; the reference's switch dispatch ran exactly one specialised
function per keypoint, Brief.h:641-732). The sorted variant
(pallas_kernels.orb_select_bits_sorted) computes angles first, sorts
keypoints by bin, and skips all rotations outside each block's [min, max]
bin range behind a scalar branch -- at the price of one argsort, one
(K, 1024) i8 row permute and one (K, 256) inverse permute.

Measures both variants on the REAL demo-pyramid windows (isolated stage,
long chains -- the stage is ~70 us) and asserts bit-identical results on
hardware first. Records the verdict for the headline-path default.
"""
import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import interleaved_ab, load_demo, xru32

from pislam_tpu.frontend import _extract_impl
from pislam_tpu.ops import brief, patches
from pislam_tpu.ops import pallas_kernels as pk
from pislam_tpu.utils import codec


def main():
    cfg, stack_np, mask = load_demo()
    img = jnp.asarray(stack_np)
    feats = jax.jit(lambda im: _extract_impl(im, mask, cfg))(img)
    xs = codec.decode_x(feats.codes).astype(jnp.int32)
    ys = codec.decode_y(feats.codes).astype(jnp.int32)
    flat = np.asarray(jax.jit(patches.gather_patches_packed_s8)(
        img, xs, ys, feats.valid))
    gm = jnp.asarray(brief._gm_packed())
    print(f"K={flat.shape[0]} real demo windows")

    # correctness: identical (angles, bits) on hardware
    a0, b0 = jax.jit(pk.orb_select_bits)(jnp.asarray(flat), gm)
    a1, b1 = jax.jit(pk.orb_select_bits_sorted)(jnp.asarray(flat), gm)
    assert np.array_equal(np.asarray(a0).ravel(), np.asarray(a1).ravel())
    assert np.array_equal(np.asarray(b0), np.asarray(b1))
    bins = np.bincount(np.asarray(a0).ravel(), minlength=30)
    print(f"bit-identical on hardware; occupied bins: "
          f"{int((bins > 0).sum())}/30")

    def dense_op(f):
        ang, bits = pk.orb_select_bits(f, gm)
        return xru32(bits) ^ ang[0].astype(jnp.uint32)

    def sorted_op(f):
        ang, bits = pk.orb_select_bits_sorted(f, gm)
        return xru32(bits) ^ ang[0].astype(jnp.uint32)

    interleaved_ab({"dense_30dot": dense_op, "angle_sorted": sorted_op},
                   jnp.asarray(flat), n_lo=2, n_hi=202, label_w=14)


if __name__ == "__main__":
    main()
