"""Throwaway probe: match_reduce tiles at K1=512 (serving frontend) and
map-scale K2 — is the k2>16384 512-row auto-select right when K1 itself
is 512 (one row group)?"""
import sys

import numpy as np
import jax.numpy as jnp

from _bench_common import interleaved_ab, xru32

from pislam_tpu.ops import pallas_kernels as pk
from pislam_tpu.matching import expand_pm1

K1, WORDS = 512, 8
K2 = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

rng = np.random.default_rng(0)
d1 = rng.integers(0, 2**31, (K1, WORDS), dtype=np.int64).astype(np.uint32)
d2 = rng.integers(0, 2**31, (K2, WORDS), dtype=np.int64).astype(np.uint32)
a = expand_pm1(jnp.asarray(d1))
b = expand_pm1(jnp.asarray(d2))
v1 = jnp.ones(K1, bool)
v2 = jnp.ones(K2, bool)
uv1 = jnp.asarray(rng.uniform(-0.4, 0.4, (K1, 2)).astype(np.float32))
uv2 = jnp.asarray(rng.uniform(-0.4, 0.4, (K2, 2)).astype(np.float32))

ops = {}
for blk in (128, 256, 512):
    for bk2 in (2048, 4096):
        def op(x, blk=blk, bk2=bk2):
            aa = a.at[0, 0].set((x[0] & 1).astype(jnp.int8) * 2 - 1)
            best, second, idx, carg = pk.match_reduce(
                aa, b, v1, v2, uv1, uv2, 0.06, block=blk, block_k2=bk2)
            return (xru32(best) ^ xru32(second) ^ xru32(idx)
                    ^ xru32(carg))
        ops[f"g{blk}x{bk2}"] = op

x0 = jnp.zeros(8, jnp.uint8)
interleaved_ab(ops, x0)
