"""Reconcile bench.py's headline with the sorted-kernel A/B — one process.

VERDICT round-2 weak #1: BENCH_r02 (bench.py methodology) reported
0.548 ms/frame while tools/ab_frontend.py's interleaved A/B reported
0.326 ms/frame for the SAME production config (fused upstream + sorted
BRIEF kernel) — a 1.64x gap that exactly matches the sorted kernel's
claimed in-context win over the dense select. Both tools build the same
in-jit chain (non-foldable probe feedback, lo/hi differenced minima), so
either (a) the two processes simply saw different tunnel/device states
(drift is +-40% BETWEEN processes, verify skill) or (b) some construction
detail of bench.py's chain defeats the rotation skipping.

This tool removes the process variable: it builds
  - bench_sorted : bench.py's exact chain (returns (codes, valid), default
                   config = fused + sorted)
  - ab_sorted    : ab_frontend.py's exact chain (returns codes only)
  - ab_dense     : same but brief_variant="dense" (the 30-matmul select)
and interleaves all six executables (lo/hi each) in one loop, differencing
minima. If bench_sorted == ab_sorted << ab_dense, the BENCH_r02 number was
pure inter-process drift and the headline stands at the sorted number.

RESULT (2026-08-20, real chip, AB_REPS=24):
    bench_sorted    0.5592 ms/frame  (1788.2 fps)
    ab_sorted       0.5630 ms/frame  (1776.1 fps)
    ab_dense        0.5781 ms/frame  (1729.7 fps)
Verdict: (a) — bench.py's chain and ab_frontend.py's chain are identical
in one process; comparing ab_frontend's 0.326 against bench's 0.55 across
processes was the error. The honest headline is ~0.56 ms/frame
(~1780 fps); README corrected. Caveat discovered en passant: the
sorted-vs-dense gap is only 3 % in THIS run, vs the 1.66x ab_frontend
recorded in its own (also interleaved, single-process) round-2 run — so
even in-context interleaved RATIOS can vary with device state between
days. The sorted default stands (never slower, lower MXU occupancy), but
treat any single interleaved ratio as one sample, not ground truth.
"""
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import load_demo

from pislam_tpu.frontend import _extract_impl


def make_bench_chain(cfg, mask, n):
    """Byte-for-byte the chain bench.py builds."""
    @jax.jit
    def f(img):
        feats = None
        for _ in range(n):
            feats = _extract_impl(img, mask, cfg)
            probe = jax.lax.reduce(
                feats.descriptors, np.uint32(0),
                jax.lax.bitwise_xor, (0, 1)) ^ feats.codes[0]
            img = img + (probe & 1).astype(jnp.uint8)
        return feats.codes, feats.valid
    return f


def make_ab_chain(cfg, mask, n):
    """Byte-for-byte the chain ab_frontend.py builds (orb_fn=None)."""
    @jax.jit
    def f(img):
        feats = None
        for _ in range(n):
            feats = _extract_impl(img, mask, cfg)
            probe = jax.lax.reduce(
                feats.descriptors, np.uint32(0),
                jax.lax.bitwise_xor, (0, 1)) ^ feats.codes[0]
            img = img + (probe & 1).astype(jnp.uint8)
        return feats.codes
    return f


def main():
    cfg, stack_np, mask = load_demo()
    stack = jnp.asarray(stack_np)
    n_lo, n_hi = 2, 22

    dense_cfg = dataclasses.replace(
        cfg, frontend=dataclasses.replace(cfg.frontend,
                                          brief_variant="dense"))

    chains = {
        "bench_sorted": (make_bench_chain(cfg, mask, n_lo),
                         make_bench_chain(cfg, mask, n_hi)),
        "ab_sorted": (make_ab_chain(cfg, mask, n_lo),
                      make_ab_chain(cfg, mask, n_hi)),
        "ab_dense": (make_ab_chain(dense_cfg, mask, n_lo),
                     make_ab_chain(dense_cfg, mask, n_hi)),
    }

    def once(f):
        t0 = time.perf_counter()
        out = f(stack)
        codes = out[0] if isinstance(out, tuple) else out
        np.asarray(codes[0])
        return time.perf_counter() - t0

    for lo, hi in chains.values():
        once(lo); once(hi)

    import os
    reps = int(os.environ.get("AB_REPS", "24"))
    times = {k: ([], []) for k in chains}
    for r in range(reps):
        for k, (lo, hi) in chains.items():
            times[k][0].append(once(lo))
            times[k][1].append(once(hi))
    print(f"reps={reps}, chain lo/hi = {n_lo}/{n_hi}")
    for k, (lo_t, hi_t) in times.items():
        per = (min(hi_t) - min(lo_t)) / (n_hi - n_lo)
        print(f"{k:14s} {per*1e3:7.4f} ms/frame  ({1/per:7.1f} fps)")


if __name__ == "__main__":
    main()
