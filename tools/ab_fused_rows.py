"""Interleaved A/B: fused upstream kernel rows-per-step (8/16/24/32)."""
import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import interleaved_ab, load_demo, xru32

from pislam_tpu.ops import nms, pallas_kernels as pk


def main():
    cfg, stack_np, mask = load_demo()
    stack = jnp.asarray(stack_np)
    fc = cfg.frontend
    sizes = (8, 16, 24, 32)
    masks = {n: jnp.asarray(pk.build_mask16(mask, n)) for n in sizes}

    def keys_of(img, n):
        return pk.fused_frontend_keys(
            img, masks[n], fc.fast_threshold, fc.harris_threshold, n)

    def make_op(n, with_topk):
        def op(img):
            keys = keys_of(img, n)
            if not with_topk:
                return xru32(pk.reduce_keys_2x(keys))
            codes, valid = nms.select_topk_codes(
                pk.reduce_keys_2x(keys), fc.max_keypoints)
            return xru32(codes) ^ xru32(valid)
        return op

    # correctness on hardware first: same survivor set at every step size
    ref = None
    for n in sizes:
        kn = np.asarray(jax.jit(
            lambda im, n=n: pk.reduce_keys_2x(keys_of(im, n)))(stack))
        kn = np.sort(kn[kn != 0])
        if ref is None:
            ref = kn
        else:
            assert np.array_equal(ref, kn), n
    print("survivor sets identical on hardware for rows/step in", sizes)

    interleaved_ab(
        {f"rows{n}+topk": make_op(n, True) for n in sizes}, stack,
        label_w=12)


if __name__ == "__main__":
    main()
