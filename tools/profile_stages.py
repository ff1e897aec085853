"""In-context stage budget of the production (fused+pallas) frontend.

Truncated-pipeline variants, all interleaved in one process; adjacent
differences give per-stage in-context costs:

  upstream_raw   fused_frontend_keys only
  upstream       + reduce_keys_2x
  topk           + select_topk_codes
  gather         + gather_windows_packed
  full           + orb_select (moments+atan2+BRIEF) + packing
"""
import jax
import jax.numpy as jnp

from _bench_common import interleaved_ab, load_demo, xru32

from pislam_tpu.frontend import _extract_impl
from pislam_tpu.ops import nms, patches, pallas_kernels as pk
from pislam_tpu.utils import codec


def main():
    cfg, stack_np, mask = load_demo()
    stack = jnp.asarray(stack_np)
    fc = cfg.frontend
    nout = pk.FUSED_NOUT   # match the production configuration exactly
    mask16 = jnp.asarray(pk.build_mask16(mask, nout))

    def upstream_raw(img):
        return xru32(pk.fused_frontend_keys(
            img, mask16, fc.fast_threshold, fc.harris_threshold, nout))

    def upstream(img):
        keys = pk.fused_frontend_keys(
            img, mask16, fc.fast_threshold, fc.harris_threshold, nout)
        return xru32(pk.reduce_keys_2x(keys))

    def topk(img):
        keys = pk.fused_frontend_keys(
            img, mask16, fc.fast_threshold, fc.harris_threshold, nout)
        codes, valid = nms.select_topk_codes(
            pk.reduce_keys_2x(keys), fc.max_keypoints)
        return xru32(codes) ^ xru32(valid)

    def gather(img):
        keys = pk.fused_frontend_keys(
            img, mask16, fc.fast_threshold, fc.harris_threshold, nout)
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

    stages = {"upstream_raw": upstream_raw, "upstream": upstream,
              "topk": topk, "gather": gather, "full": full}
    res = interleaved_ab(stages, stack, reps=20, label_w=14)
    prev = 0.0
    print("adjacent stage increments:")
    for k in stages:
        print(f"  {k:14s} +{(res[k]-prev)*1e3:7.4f} ms")
        prev = res[k]


if __name__ == "__main__":
    main()
