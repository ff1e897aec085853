"""In-context decomposition of the window-gather stage with REAL indices.

Unlike ab_gather.py (random constant indices), these variants sit inside the
production pipeline: indices come from the top-k codes, so the measurement
reflects the dependency structure the frame actually executes.

  base     upstream + reduce + topk (no gather)
  rows     + strips pack + 9-row take            (rows consumed raw)
  full     + realign kernel                      (windows consumed)
"""
import jax
import jax.numpy as jnp
import numpy as np

from _bench_common import interleaved_ab, load_demo, xru32

from pislam_tpu.ops import nms, pallas_kernels as pk
from pislam_tpu.utils import codec

RADIUS = pk.RADIUS
NR = pk.NR


def main():
    cfg, stack_np, mask = load_demo()
    stack = jnp.asarray(stack_np)
    fc = cfg.frontend
    nout = pk.FUSED_NOUT
    mask16 = jnp.asarray(pk.build_mask16(mask, nout))

    def select(img):
        keys = pk.fused_frontend_keys(
            img, mask16, fc.fast_threshold, fc.harris_threshold, nout)
        return nms.select_topk_codes(
            pk.reduce_keys_2x(keys), fc.max_keypoints)

    def rows_of(img, codes, valid):
        h, w = img.shape
        xs = codec.decode_x(codes).astype(jnp.int32)
        ys = codec.decode_y(codes).astype(jnp.int32)
        h4 = h // 4
        ns = pk.num_strips(w)
        strips = pk.pack_row_strips(img).reshape(ns * h4, 256)
        sx = jnp.clip(jnp.where(valid, xs, RADIUS + 1),
                      RADIUS, w - RADIUS - 2)
        sy = jnp.clip(jnp.where(valid, ys, RADIUS + 1),
                      RADIUS, h - RADIUS - 2)
        strip = jnp.clip((sx - RADIUS) >> 7, 0, ns - 1)
        phi = (sx - RADIUS) - 128 * strip
        r0 = (sy - RADIUS) >> 2
        psi = (sy - RADIUS) & 3
        ridx = (strip[:, None] * h4 + r0[:, None]
                + jnp.arange(NR, dtype=jnp.int32)[None, :])
        ridx = jnp.minimum(ridx, (strip[:, None] + 1) * h4 - 1)
        k = xs.shape[0]
        rows = jnp.take(strips, ridx.reshape(-1), axis=0).reshape(k, NR, 256)
        return rows, psi, phi

    def v_base(img):
        codes, valid = select(img)
        return xru32(codes) ^ xru32(valid)

    def v_rows(img):
        codes, valid = select(img)
        rows, _, _ = rows_of(img, codes, valid)
        return xru32(rows) ^ xru32(codes)

    def v_full(img):
        codes, valid = select(img)
        rows, psi, phi = rows_of(img, codes, valid)
        win = pk.realign_windows(rows, psi, phi)
        return xru32(win) ^ xru32(codes)

    def v_full2d(img):
        codes, valid = select(img)
        rows, psi, phi = rows_of(img, codes, valid)
        win = pk.realign_windows2d(rows, psi, phi)
        return xru32(win) ^ xru32(codes)

    res = interleaved_ab({"base": v_base, "rows": v_rows, "full": v_full,
                          "full2d": v_full2d},
                         stack, reps=20, label_w=6)
    print(f"strips+take: +{(res['rows']-res['base'])*1e3:7.4f} ms")
    print(f"realign 3d : +{(res['full']-res['rows'])*1e3:7.4f} ms")
    print(f"realign 2d : +{(res['full2d']-res['rows'])*1e3:7.4f} ms")


if __name__ == "__main__":
    main()
