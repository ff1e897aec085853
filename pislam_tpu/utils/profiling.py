"""Tracing / profiling harness.

The reference's only tracing is std::clock() bracketing in the demo
(demo.cpp:75-113) plus doc-comment throughput notes; its perf charts
(doc/stage_times.png) break a frame into detect/score/NMS/describe stages.
This module reproduces that per-stage breakdown for the TPU pipeline and
wraps jax.profiler for full XLA traces.

IMPORTANT measurement note: on the tunneled single-chip setup,
jax.block_until_ready does NOT synchronise; `steady_state_ms` uses the
chained-dependency methodology (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import numpy as np
import jax
import jax.numpy as jnp


def steady_state_ms(fn: Callable, feed, n1: int = 5, n2: int = 25) -> float:
    """Per-call milliseconds of `fn(feed)` with true device sync.

    Chains iterations by mixing a zeroed scalar of the output back into the
    input, does one host readback, and differences two run lengths to cancel
    the fixed tunnel-sync overhead.
    """
    def run_u8(n):
        x = feed
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(x)
            d = jax.tree.leaves(out)[0].reshape(-1)[0]
            x = feed + (d.astype(jnp.uint32) & jnp.uint32(0)).astype(feed.dtype)
        _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
        return time.perf_counter() - t0

    run_u8(2)
    return (run_u8(n2) - run_u8(n1)) / (n2 - n1) * 1e3


def stage_times(cfg, pyramid_stacked) -> Dict[str, float]:
    """Per-stage ms for one frame: the TPU mirror of doc/stage_times.png.

    Stages are measured as cumulative jitted prefixes (deltas can be slightly
    negative at XLA fusion boundaries; treat them as ~0).
    """
    from ..config import PislamConfig
    from ..frontend import _extract_impl
    from ..ops import fast, harris, nms, orientation, patches, brief
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
            keep = nms.nms(score)
            enc = nms.encode_grid(score, keep)
            codes, valid = nms.select_topk(enc, fc.max_keypoints)
            if stage == "nms_topk":
                return codes
            xs = codec.decode_x(codes).astype(jnp.int32)
            ys = codec.decode_y(codes).astype(jnp.int32)
            p = patches.gather_patches_s8(img, xs, ys, valid)
            if stage == "gather":
                return p
            m10, m01 = orientation.centroids(p)
            a = orientation.atan2_bins(m10, m01)
            if stage == "orientation":
                return a
            return brief.describe(p, a, fc.words)
        return jax.jit(f)

    stages = ["fast_detect", "harris", "nms_topk", "gather", "orientation",
              "describe"]
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
