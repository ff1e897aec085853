"""Interleaved A/B: Pallas fused match reductions vs the XLA path.

Real descriptors from the demo pyramid on both sides, full match semantics
(ratio + cross-check) in both variants. By default the database is one
frame (K2=2048); pass a K2 on the command line (e.g. 16384) to benchmark
the map-scale K2-tiled kernel against the XLA whole-matrix fallback — the
regime where the fallback materialises a (K1, K2) i32 HBM transient
(128 MB at K2=16384) while the tiled kernel streams VMEM blocks.

RESULT (2026-08-20, real chip, K1=2048 K2=16384, 20 interleaved reps):
    pallas_match    0.2065 ms     xla_match       0.7587 ms
    pallas_gated    0.2441 ms     xla_gated       0.7635 ms
All four reductions bit-identical on hardware (gated and ungated). The
fused coordinate gate costs ~0.04 ms over the ungated kernel and beats
the XLA dense-gate path 3.1x -- the production map-tracking config
(gate_radius=0.06) now takes the kernel branch in matching.match_gated
and parallel/dist._sharded_match_local.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import interleaved_ab, load_demo

from pislam_tpu import matching
from pislam_tpu.frontend import _extract_impl


def main():
    k2 = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    cfg, stack_np, mask = load_demo()
    feats = jax.jit(lambda im: _extract_impl(im, mask, cfg))(
        jnp.asarray(stack_np))
    d1 = np.asarray(feats.descriptors)
    v1 = np.asarray(feats.valid)
    if k2 and k2 != d1.shape[0]:
        # map-scale database: tile the real frame descriptors with per-copy
        # bit jitter (distinct landmarks, realistic distance statistics)
        reps = -(-k2 // d1.shape[0])
        rng = np.random.default_rng(0)
        tiles = [np.roll(d1, 7 * i, axis=0)
                 ^ rng.integers(0, 2, d1.shape, dtype=np.uint32)
                 for i in range(reps)]
        d2 = np.concatenate(tiles)[:k2]
        v2 = np.concatenate([np.roll(v1, 7 * i) for i in range(reps)])[:k2]
    else:
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

    # correctness: all four raw reductions bit-identical on hardware
    def pallas_raw(d):
        from pislam_tpu.ops import pallas_kernels as pk

        return pk.match_reduce(matching.expand_pm1(d),
                               matching.expand_pm1(jd2), jv1, jv2)

    def xla_raw(d):
        dist = matching.hamming_matrix(d, jd2, jv1, jv2)
        idx2, best, second = matching._best_two(dist)
        return best, second, idx2, jnp.argmin(dist, axis=0)

    pr = [np.asarray(o) for o in jax.jit(pallas_raw)(jnp.asarray(d1))]
    xr = [np.asarray(o) for o in jax.jit(xla_raw)(jnp.asarray(d1))]
    for name, p, x in zip(("best", "second", "idx", "col_argmin"), pr, xr):
        assert np.array_equal(p, x), f"{name} diverges on hardware"
    print(f"pallas and XLA reductions bit-identical on hardware "
          f"(K1={d1.shape[0]}, K2={d2.shape[0]})")

    # projection-gated variants (the production map-tracking config,
    # cfg.map.gate_radius=0.06): fused per-tile coordinate gate vs the XLA
    # dense d2-matrix gate (matching.match_gated's two branches)
    rng = np.random.default_rng(3)
    uv1 = jnp.asarray(rng.uniform(-0.5, 0.5, (d1.shape[0], 2))
                      .astype(np.float32))
    uv2 = jnp.asarray(rng.uniform(-0.5, 0.5, (d2.shape[0], 2))
                      .astype(np.float32))
    radius = 0.06

    def pallas_gated(d):
        from pislam_tpu.ops import pallas_kernels as pk

        a = matching.expand_pm1(d)
        b = matching.expand_pm1(jd2)
        best, second, idx2, carg = pk.match_reduce(
            a, b, jv1, jv2, uv1, uv2, radius)
        return probe(*filters(best, second, idx2, carg, jv1, d.shape[0]))

    def xla_gated(d):
        dist = matching.hamming_matrix(d, jd2, jv1, jv2)
        dd = jnp.sum((uv1[:, None, :] - uv2[None, :, :]) ** 2, axis=-1)
        dist = jnp.where(dd <= radius * radius, dist, matching.MAX_DIST)
        idx2, best, second = matching._best_two(dist)
        rbest = jnp.argmin(dist, axis=0)
        return probe(*filters(best, second, idx2, rbest, jv1, d.shape[0]))

    def pallas_gated_raw(d):
        from pislam_tpu.ops import pallas_kernels as pk

        return pk.match_reduce(matching.expand_pm1(d),
                               matching.expand_pm1(jd2), jv1, jv2,
                               uv1, uv2, radius)

    def xla_gated_raw(d):
        dist = matching.hamming_matrix(d, jd2, jv1, jv2)
        dd = jnp.sum((uv1[:, None, :] - uv2[None, :, :]) ** 2, axis=-1)
        dist = jnp.where(dd <= radius * radius, dist, matching.MAX_DIST)
        idx2, best, second = matching._best_two(dist)
        return best, second, idx2, jnp.argmin(dist, axis=0)

    pg = [np.asarray(o) for o in jax.jit(pallas_gated_raw)(jnp.asarray(d1))]
    xg = [np.asarray(o) for o in jax.jit(xla_gated_raw)(jnp.asarray(d1))]
    for name, p, x in zip(("best", "second", "idx", "col_argmin"), pg, xg):
        assert np.array_equal(p, x), f"gated {name} diverges on hardware"
    print("gated reductions bit-identical on hardware (radius=0.06)")

    # ~50 us ops need long chains against the ~30 ms readback drift
    interleaved_ab({"pallas_match": pallas_op, "xla_match": xla_op,
                    "pallas_gated": pallas_gated, "xla_gated": xla_gated},
                   jnp.asarray(d1), n_lo=2, n_hi=202, label_w=14)


if __name__ == "__main__":
    main()
