"""Interleaved A/B of batched (multi-stream) extraction throughput.

Serving scenario: B camera streams / offline mapping shards extracted per
dispatch via vmap. Per-frame time = chain-iteration time / B.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import load_demo


from pislam_tpu.frontend import _extract_impl
from pislam_tpu.ops import nms




def main():
    cfg, stack_np, mask = load_demo()
    n_lo, n_hi = 2, 12
    batches = [int(b) for b in os.environ.get("AB_BATCH", "1,2,4,8").split(",")]

    def make_chain(b, n):
        ext = lambda im: _extract_impl(im, mask, cfg)
        if b > 1:
            ext = jax.vmap(ext)

        @jax.jit
        def f(img):
            feats = None
            for _ in range(n):
                feats = ext(img)
                probe = jax.lax.reduce(
                    feats.descriptors, np.uint32(0),
                    jax.lax.bitwise_xor,
                    tuple(range(feats.descriptors.ndim))) ^ feats.codes.reshape(-1)[0]
                img = img + (probe & 1).astype(jnp.uint8)
            return feats.codes
        return f

    variants = {}
    inputs = {}
    for b in batches:
        x = np.stack([stack_np] * b) if b > 1 else stack_np
        inputs[b] = jnp.asarray(x)
        variants[b] = (make_chain(b, n_lo), make_chain(b, n_hi))

    def once(b, f):
        t0 = time.perf_counter()
        np.asarray(f(inputs[b]).reshape(-1)[0])
        return time.perf_counter() - t0

    for b, (lo, hi) in variants.items():
        once(b, lo); once(b, hi)

    times = {b: ([], []) for b in batches}
    for _ in range(int(os.environ.get("AB_REPS", "12"))):
        for b, (lo, hi) in variants.items():
            times[b][0].append(once(b, lo))
            times[b][1].append(once(b, hi))
    for b, (lo_t, hi_t) in times.items():
        per = (min(hi_t) - min(lo_t)) / (n_hi - n_lo) / b
        print(f"batch={b:2d}  {per*1e3:7.4f} ms/frame  ({1/per:7.1f} fps/chip)")


if __name__ == "__main__":
    main()
