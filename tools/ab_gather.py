"""Interleaved A/B decomposition of the window-gather stage.

Historical verdict recorded here: an "8-pack" gather variant (2 gathered
2048-lane rows per keypoint instead of NR=9 256-lane rows) measured ~5x
slower end-to-end -- its realign kernel's wide-lane pltpu.roll rounds cost
~0.6 ms, dwarfing the 16 ns/row gather savings. The production path stays
NR=9. The strips8 variants below remain measurable for reference.
"""
import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import interleaved_ab, load_demo, xru32

from pislam_tpu.ops import pallas_kernels as pk

RADIUS = pk.RADIUS


def main():
    cfg, stack_np, _ = load_demo()
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

    def strips8_of(img):
        strips = pk.pack_row_strips(img)
        if h8 * 8 != h4:
            strips = jnp.pad(strips, ((0, 0), (0, h8 * 8 - h4), (0, 0)))
        return strips.reshape(ns * h8, 2048)

    def v_full(img):
        return xru32(jax.lax.bitcast_convert_type(
            pk.gather_windows_packed(img, xs, ys, valid)
            .reshape(k, 256, 4), jnp.uint32))

    def v_strips8(img):
        return xru32(strips8_of(img))

    def v_take2(img):
        strips8 = strips8_of(img)
        base = (jnp.clip(xs - RADIUS, 0, None) >> 7) * h8 \
            + (((ys - RADIUS) >> 2) >> 3)
        ridx = base[:, None] + jnp.arange(2, dtype=jnp.int32)[None, :]
        return xru32(jnp.take(strips8, ridx.reshape(-1), axis=0))

    def v_strips(img):
        return xru32(pk.pack_row_strips(img))

    interleaved_ab({
        "full": v_full,
        "strips8_relayout": v_strips8,
        "strips8+take2": v_take2,
        "strips_only": v_strips,
    }, stack, label_w=18)


if __name__ == "__main__":
    main()
