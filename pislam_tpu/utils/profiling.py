"""Tracing / profiling harness.

The reference's only tracing is std::clock() bracketing in the demo
(demo.cpp:75-113) plus doc-comment throughput notes; its perf charts
(doc/stage_times.png) break a frame into detect/score/NMS/describe stages.
This module reproduces that per-stage breakdown for the TPU pipeline and
wraps jax.profiler for full XLA traces.

IMPORTANT measurement notes for the tunneled single-chip setup (full
rationale in .claude/skills/verify/SKILL.md):

* jax.block_until_ready does NOT synchronise; only a host readback does.
* every Python-level dispatch costs 1-4 ms, so chains must run INSIDE one
  jit, with a non-foldable data dependency (`out & 1`; `& 0` folds and XLA
  CSEs the iterations away).
* the dependency must consume every output you want timed, or XLA
  dead-codes/slices the stages producing the unused parts in intermediate
  iterations (a one-element probe of a matmul output times one matmul row).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import numpy as np
import jax
import jax.numpy as jnp


def _xor_probe(out) -> jax.Array:
    """Scalar uint32 depending on every element of every output leaf."""
    acc = jnp.uint32(0)
    for leaf in jax.tree.leaves(out):
        v = leaf.reshape(-1)
        if v.dtype == jnp.uint32:
            u = v
        elif v.dtype in (jnp.int32, jnp.float32):
            u = jax.lax.bitcast_convert_type(v, jnp.uint32)
        else:
            u = v.astype(jnp.uint32)
        acc = acc ^ jax.lax.reduce(u, np.uint32(0), jax.lax.bitwise_xor, (0,))
    return acc


def steady_state_ms(fn: Callable, feed, n_lo: int = 2, n_hi: int = 12,
                    reps: int = 5) -> float:
    """Per-call milliseconds of `fn(feed)` with true device sync.

    Builds jits that run `fn` n times chained through a full xor-probe of
    the outputs, syncs once with a host readback, and differences the two
    chain lengths (median of `reps`).
    """

    def make(n):
        @jax.jit
        def f(x):
            out = None
            for _ in range(n):
                out = fn(x)
                x = x + (_xor_probe(out) & 1).astype(x.dtype)
            return _xor_probe(out)
        return f

    f_lo, f_hi = make(n_lo), make(n_hi)

    def run(f):
        np.asarray(f(feed))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(feed))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (run(f_hi) - run(f_lo)) / (n_hi - n_lo) * 1e3


def stage_times(cfg, pyramid_stacked) -> Dict[str, float]:
    """Per-stage ms for one frame: the TPU mirror of doc/stage_times.png.

    Stages are measured as cumulative jitted prefixes. Caveat: XLA compiles
    each prefix as a separate program with its own schedule, so deltas are
    indicative, not additive ground truth -- the honest end-to-end number is
    the "total" row (and bench.py).
    """
    from ..ops import fast, harris, nms, patches, brief
    from ..utils import codec

    pc = cfg.pyramid
    mask = jnp.asarray(nms.make_level_mask(
        pc.level_sizes, pc.level_rows, pc.padded_height, pc.stride,
        cfg.frontend.border))
    fc = cfg.frontend

    def upto(stage):
        def f(img):
            corner = fast.fast_detect(img, fc.fast_threshold)
            if stage == "fast_detect":
                return corner
            score = harris.harris_score(img, fc.harris_threshold, mask=corner)
            score = jnp.where(mask, score, jnp.uint8(0))
            if stage == "harris":
                return score
            scored = jnp.where(nms.nms(score), score, jnp.uint8(0))
            codes, valid = nms.select_topk_scored(scored, fc.max_keypoints)
            if stage == "nms_topk":
                return codes
            xs = codec.decode_x(codes).astype(jnp.int32)
            ys = codec.decode_y(codes).astype(jnp.int32)
            flat = patches.gather_patches_packed_s8(img, xs, ys, valid)
            if stage == "gather":
                return flat, codes
            angles, desc = brief.orb_compute_packed(flat, fc.words)
            return desc, codes
        return f

    stages = ["fast_detect", "harris", "nms_topk", "gather", "describe"]
    out: Dict[str, float] = {}
    prev = 0.0
    for s in stages:
        t = steady_state_ms(upto(s), pyramid_stacked)
        out[s] = max(t - prev, 0.0)
        prev = t
    out["total"] = prev
    return out


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture a full XLA/TPU profiler trace viewable in TensorBoard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
