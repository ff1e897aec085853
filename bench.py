"""Headline benchmark: VGA ORB extraction frames/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference extracts ~1000-1900 ORB features from a VGA 8-level
pyramid in ~19.5-24 ms on a Raspberry Pi 3 single core (BASELINE.md,
doc/frame_times.png) ~= 50 fps. vs_baseline = our fps / 50.

Measures the full jitted frontend (FAST + Harris + NMS + top-K + orientation
+ BRIEF-256) on the reference's own demo pyramid (640x2210, 8 levels,
demo/input.png) at the demo thresholds, yielding the same ~1753 features.

Timing methodology (see .claude/skills/verify/SKILL.md): the tunneled "axon"
TPU platform has ~1-4 ms of per-Python-dispatch overhead and
block_until_ready does not synchronise, so we measure device throughput with
IN-JIT chains: one jit runs the frontend N times with a non-foldable data
dependency between iterations (feed `codes[0] & 1` back into the image so
XLA cannot CSE the iterations), one host readback syncs, and we difference
two chain lengths to cancel the fixed dispatch + sync cost. This reports
steady-state device throughput, the number a production pipeline (which
streams frames without a per-frame host round-trip) actually sees.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from pislam_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def load_demo_pyramid():
    import pislam_tpu

    cfg = pislam_tpu.PislamConfig()
    pc = cfg.pyramid
    stack = np.zeros((pc.padded_height, pc.stride), np.uint8)
    path = "/root/reference/demo/input.png"
    if os.path.exists(path):
        try:
            from PIL import Image
            img = np.asarray(Image.open(path).convert("L"))
            stack[: img.shape[0], : img.shape[1]] = img
            return cfg, stack
        except Exception:
            pass
    # fallback: synthetic textured pyramid (same shapes/work; FAST/Harris are
    # largely content-independent, SURVEY.md section 6)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (pc.total_height, pc.base_width), np.uint8)
    stack[: pc.total_height, : pc.base_width] = base
    return cfg, stack


def main():
    from pislam_tpu.config import PislamConfig
    from pislam_tpu.frontend import _extract_impl
    from pislam_tpu.ops import nms

    cfg, stack_np = load_demo_pyramid()
    pc = cfg.pyramid
    stack = jnp.asarray(stack_np)
    mask = jnp.asarray(nms.make_level_mask(
        pc.level_sizes, pc.level_rows, pc.padded_height, pc.stride,
        cfg.frontend.border))

    def make_chain(n):
        @jax.jit
        def f(img):
            feats = None
            for _ in range(n):
                feats = _extract_impl(img, mask, cfg)
                # non-foldable dependency on EVERY output so XLA can neither
                # CSE the iterations nor dead-code intermediate stages; the
                # xor-reduce forces every descriptor row (a single-element
                # probe would let XLA slice the BRIEF matmul to one row)
                probe = jax.lax.reduce(
                    feats.descriptors, np.uint32(0),
                    jax.lax.bitwise_xor, (0, 1)) ^ feats.codes[0]
                img = img + (probe & 1).astype(jnp.uint8)
            return feats.codes, feats.valid
        return f

    n_lo, n_hi = 2, 22
    f_lo, f_hi = make_chain(n_lo), make_chain(n_hi)

    _, valid1 = make_chain(1)(stack)  # unperturbed frame for the count
    nfeat = int(np.asarray(valid1).sum())

    def once(f):
        t0 = time.perf_counter()
        c, _ = f(stack)
        np.asarray(c[0])  # true sync (one tunnel round-trip)
        return time.perf_counter() - t0

    once(f_lo)  # warm both executables before timing
    once(f_hi)
    # the tunnel drifts +-40% between runs: interleave the two chain
    # lengths and take mins so both see the same best-case device state
    lo, hi = [], []
    for _ in range(10):
        lo.append(once(f_lo))
        hi.append(once(f_hi))
    per = (min(hi) - min(lo)) / (n_hi - n_lo)
    fps = 1.0 / per

    pi3_fps = 50.0  # BASELINE.md: ~20 ms/frame at ~1000-1900 features
    print(json.dumps({
        "metric": "vga_orb_extract_fps_per_chip",
        "value": round(fps, 1),
        "unit": f"frames/s (8-level VGA pyramid, {nfeat} feats, 256-bit)",
        "vs_baseline": round(fps / pi3_fps, 2),
    }))


if __name__ == "__main__":
    main()
