"""Headline benchmark: VGA ORB extraction frames/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference extracts ~1000-1900 ORB features from a VGA 8-level
pyramid in ~19.5-24 ms on a Raspberry Pi 3 single core (BASELINE.md,
doc/frame_times.png) ~= 50 fps. vs_baseline = our fps / 50.

Measures the full jitted frontend (FAST + Harris + NMS + top-K + orientation
+ BRIEF-256) on the reference's own demo pyramid (640x2210, 8 levels,
demo/input.png) at the demo thresholds, yielding the same ~1753 features.

Timing methodology (see .claude/skills/verify/SKILL.md): on the tunneled TPU,
jax.block_until_ready does not synchronise, so we chain N iterations with a
data dependency and do one host readback, differencing two N to cancel the
fixed sync overhead.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pislam_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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
    import pislam_tpu

    cfg, stack_np = load_demo_pyramid()
    stack = jnp.asarray(stack_np)
    extract = pislam_tpu.make_extract_fn(cfg)

    feats = extract(stack)
    nfeat = int(np.asarray(feats.valid).sum())

    def chain_run(n):
        s = stack
        t0 = time.perf_counter()
        f = None
        for _ in range(n):
            f = extract(s)
            s = stack + (f.codes[0] & jnp.uint32(0)).astype(jnp.uint8)
        _ = np.asarray(f.codes[0])
        return time.perf_counter() - t0

    chain_run(3)  # warm
    n1, n2 = 5, 55
    per = (chain_run(n2) - chain_run(n1)) / (n2 - n1)
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
