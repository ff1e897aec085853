"""Interleaved A/B: match-kernel tile sizes at map-scale K2 (round-4
verdict task 4 -- the matcher ran at ~21% of int8 MXU peak at K2=16384
and is the kernel that scales with map size).

Sweeps (row block, database block) tile shapes of
pallas_kernels.match_reduce at a given K2 (default 131072 -- the
131k-landmark capacity demonstrated by tests/test_map_scale.py), gated
and ungated, all variants interleaved in ONE process per the verify
playbook. Correctness: every variant's four reductions are asserted
bit-identical to the default-tile kernel on hardware before timing.

RESULT (2026-08-20, real chip, K1=2048, interleaved, all shapes
bit-identical; (256,8192)/(512,4096) excluded -- their 8 MB distance
tiles + temporaries overflow the 16 MB scoped-VMEM ceiling at compile):
  K2=131072 (2x65536 segments):  u256x2048 1.498  u256x4096 1.512
    u512x2048 1.380 ms | g256x2048 1.807  g256x4096 1.782
    g512x2048 1.687 ms
  K2=16384:                      u256x2048 0.171  u256x4096 0.191
    u512x2048 0.193 ms | g256x2048 0.233  g256x4096 0.239
    g512x2048 0.229 ms
Verdict: the optimum is database-size-dependent -- 512-row blocks win
~8% once the K2 stream dominates (the row block amortises each database
tile over more MXU work), 256 wins at frame scale. match_reduce now
auto-selects 512 rows for k2 > 16384. At the 131k best (1.380 ms):
2*2048*131072*256 int8 MACs = 137.4 GOP -> ~100 TOPS ~ 25% of the v5e
int8 MXU peak (round 4 measured 21% at 16k) -- one interleaved sample,
same-day caveats apply (see the verify playbook).

Run: python tools/ab_match_blocks.py [K2]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import interleaved_ab, load_demo

from pislam_tpu import matching
from pislam_tpu.frontend import _extract_impl
from pislam_tpu.ops import pallas_kernels as pk


def main():
    k2 = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    cfg, stack_np, mask = load_demo()
    feats = jax.jit(lambda im: _extract_impl(im, mask, cfg))(
        jnp.asarray(stack_np))
    d1 = np.asarray(feats.descriptors)
    v1 = np.asarray(feats.valid)
    reps = -(-k2 // d1.shape[0])
    rng = np.random.default_rng(0)
    tiles = [np.roll(d1, 7 * i, axis=0)
             ^ rng.integers(0, 2, d1.shape, dtype=np.uint32)
             for i in range(reps)]
    d2 = np.concatenate(tiles)[:k2]
    v2 = np.concatenate([np.roll(v1, 7 * i) for i in range(reps)])[:k2]
    uv1 = jnp.asarray(rng.uniform(-0.5, 0.5, (d1.shape[0], 2))
                      .astype(np.float32))
    uv2 = jnp.asarray(rng.uniform(-0.5, 0.5, (k2, 2)).astype(np.float32))
    jv1, jv2, jd2 = jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(d2)
    b_exp = matching.expand_pm1(jd2)

    def probe(outs):
        best, second, idx2, carg = outs
        return (jax.lax.reduce(best.astype(jnp.uint32), np.uint32(0),
                               jax.lax.bitwise_xor, (0,))
                ^ jax.lax.reduce(carg.astype(jnp.uint32), np.uint32(0),
                                 jax.lax.bitwise_xor, (0,))
                ^ idx2[0].astype(jnp.uint32) ^ second[1].astype(jnp.uint32))

    # d-tile budget: (blk, bk2) i32 distance tile + its elementwise
    # temporaries live in VMEM -- 8 MB tiles ((256,8192)/(512,4096))
    # measurably overflow the 16 MB scoped ceiling at compile (18.69M)
    shapes = [(256, 2048), (256, 4096), (512, 2048)]

    def make(blk, bk2, gated):
        def op(d):
            a = matching.expand_pm1(d)
            if gated:
                outs = pk.match_reduce(a, b_exp, jv1, jv2, uv1, uv2, 0.06,
                                       block=blk, block_k2=bk2)
            else:
                outs = pk.match_reduce(a, b_exp, jv1, jv2,
                                       block=blk, block_k2=bk2)
            return probe(outs)
        return op

    # correctness first: every tile shape bit-identical to the default
    ref = [np.asarray(o) for o in jax.jit(
        lambda d: pk.match_reduce(matching.expand_pm1(d), b_exp, jv1, jv2))(
        jnp.asarray(d1))]
    for blk, bk2 in shapes:
        got = [np.asarray(o) for o in jax.jit(
            lambda d: pk.match_reduce(matching.expand_pm1(d), b_exp, jv1,
                                      jv2, block=blk, block_k2=bk2))(
            jnp.asarray(d1))]
        for name, p, x in zip(("best", "second", "idx", "col"), got, ref):
            assert np.array_equal(p, x), (blk, bk2, name)
    print(f"all tile shapes bit-identical at K1={d1.shape[0]} K2={k2}")

    variants = {}
    for blk, bk2 in shapes:
        variants[f"u{blk}x{bk2}"] = make(blk, bk2, False)
    for blk, bk2 in shapes:
        variants[f"g{blk}x{bk2}"] = make(blk, bk2, True)
    interleaved_ab(variants, jnp.asarray(d1), n_lo=2, n_hi=42, label_w=12)


if __name__ == "__main__":
    main()
