"""In-context A/B of reduce_keys_2x variants (after the fused upstream)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import interleaved_ab, load_demo, xru32

from pislam_tpu.ops import pallas_kernels as pk


def reduce_matmul_f32_highest(m):
    """The historical implementation this tool's verdict retired."""
    w = m.shape[1]
    hm = jnp.maximum(m, jnp.roll(m, -1, axis=1))
    hmu = jax.lax.bitcast_convert_type(hm, jnp.uint32)
    deint = jnp.asarray(_deint_mat(w))
    hi = jnp.dot((hmu >> 16).astype(jnp.float32), deint,
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    lo = jnp.dot((hmu & jnp.uint32(0xFFFF)).astype(jnp.float32), deint,
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    keys = (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32)
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
    cfg, stack_np, mask = load_demo()
    stack = jnp.asarray(stack_np)
    fc = cfg.frontend
    nout = pk.FUSED_NOUT
    mask16 = jnp.asarray(pk.build_mask16(mask, nout))

    def keys_of(img):
        return pk.fused_frontend_keys(
            img, mask16, fc.fast_threshold, fc.harris_threshold, nout)

    def make_op(red):
        return lambda img: xru32(red(keys_of(img)))

    # correctness first (vs the production reduce)
    ref = None
    for name, red in [("matmul", reduce_matmul_f32_highest),
                      ("strided", pk.reduce_keys_2x),
                      ("bf16q", reduce_bf16_quarters)]:
        out = np.asarray(jax.jit(lambda im, red=red: red(keys_of(im)))(stack))
        if ref is None:
            ref = out
        else:
            assert np.array_equal(ref, out), f"{name} mismatch"
    print("all reduce variants bit-identical")

    interleaved_ab({
        "matmul_f32_highest": make_op(reduce_matmul_f32_highest),
        "strided_slice(prod)": make_op(pk.reduce_keys_2x),
        "bf16_quarters": make_op(reduce_bf16_quarters),
        "raw(no reduce)": make_op(lambda k: k),
    }, stack)


if __name__ == "__main__":
    main()
