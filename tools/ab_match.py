"""Interleaved A/B: Pallas fused match reductions vs the XLA path.

Real descriptors from the demo pyramid on both sides (K=2048), full match
semantics (ratio + cross-check) in both variants.
"""
import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import interleaved_ab, load_demo

from pislam_tpu import matching
from pislam_tpu.frontend import _extract_impl


def main():
    cfg, stack_np, mask = load_demo()
    feats = jax.jit(lambda im: _extract_impl(im, mask, cfg))(
        jnp.asarray(stack_np))
    d1 = np.asarray(feats.descriptors)
    v1 = np.asarray(feats.valid)
    d2 = np.roll(d1, 7, axis=0)
    v2 = np.roll(v1, 0)

    def filters(best, second, idx2, rbest, valid1, k1):
        ok = best <= 64
        ok &= best.astype(jnp.float32) < 0.8 * second.astype(jnp.float32)
        ok &= rbest[idx2] == jnp.arange(k1)
        ok &= valid1
        return jnp.where(ok, idx2, -1), jnp.where(ok, best, matching.MAX_DIST)

    def probe(idx, dist):
        return (jax.lax.reduce(dist.astype(jnp.uint32), np.uint32(0),
                               jax.lax.bitwise_xor, (0,))
                ^ idx[0].astype(jnp.uint32))

    jv1 = jnp.asarray(v1)
    jv2 = jnp.asarray(v2)
    jd2 = jnp.asarray(d2)

    def pallas_op(d):
        from pislam_tpu.ops import pallas_kernels as pk

        a = matching.expand_pm1(d)
        b = matching.expand_pm1(jd2)
        best, second, idx2, carg = pk.match_reduce(a, b, jv1, jv2)
        return probe(*filters(best, second, idx2, carg, jv1, d.shape[0]))

    def xla_op(d):
        dist = matching.hamming_matrix(d, jd2, jv1, jv2)
        idx2, best, second = matching._best_two(dist)
        rbest = jnp.argmin(dist, axis=0)
        return probe(*filters(best, second, idx2, rbest, jv1, d.shape[0]))

    # correctness: identical matches on hardware
    a = np.asarray(jax.jit(pallas_op)(jnp.asarray(d1)))
    b = np.asarray(jax.jit(xla_op)(jnp.asarray(d1)))
    assert a == b, (a, b)
    print("pallas and XLA match probes identical on hardware")

    # ~50 us ops need long chains against the ~30 ms readback drift
    interleaved_ab({"pallas_match": pallas_op, "xla_match": xla_op},
                   jnp.asarray(d1), n_lo=2, n_hi=202, label_w=14)


if __name__ == "__main__":
    main()
