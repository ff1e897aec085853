"""Shared harness for the on-hardware A/B and profiling tools.

Encapsulates the timing methodology (verify skill, "TPU timing gotchas"):
in-jit chains with a non-foldable feedback dependency, one true host-sync
readback, lo/hi chain lengths differenced, ALL variants interleaved in one
loop with minima compared (the chip drifts +-40% between runs; >=16 reps —
10-rep minima have flipped 5% verdicts).
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys  # noqa: E402

if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pislam_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def load_demo():
    """(cfg, stacked demo pyramid u8 np array, level mask np array)."""
    from PIL import Image

    from pislam_tpu.config import PislamConfig
    from pislam_tpu.ops import nms

    cfg = PislamConfig()
    pc = cfg.pyramid
    stack = np.zeros((pc.padded_height, pc.stride), np.uint8)
    img = np.asarray(Image.open("/root/reference/demo/input.png").convert("L"))
    stack[: img.shape[0], : img.shape[1]] = img
    mask = np.asarray(nms.make_level_mask(
        pc.level_sizes, pc.level_rows, pc.padded_height, pc.stride,
        cfg.frontend.border))
    return cfg, stack, mask


def xru32(o):
    """Xor-reduce EVERY element (a partial probe lets XLA slice the work)."""
    return jax.lax.reduce(o.astype(jnp.uint32), np.uint32(0),
                          jax.lax.bitwise_xor, tuple(range(o.ndim)))


def make_chain(op, n):
    """jit running ``op`` n times; op: u8 array -> u32 scalar probe."""
    @jax.jit
    def f(x):
        o = None
        for _ in range(n):
            o = op(x)
            x = x + (o & 1).astype(x.dtype)
        return o
    return f


def interleaved_ab(ops, x, n_lo=2, n_hi=12, reps=None, label_w=20):
    """Time op variants with interleaved lo/hi chains; print + return ms.

    ops: {name: op}; op: array -> u32 scalar probe. Returns
    {name: per-iteration seconds} from differenced minima.
    """
    reps = reps or int(os.environ.get("AB_REPS", "16"))
    chains = {k: (make_chain(op, n_lo), make_chain(op, n_hi))
              for k, op in ops.items()}

    def once(f):
        t0 = time.perf_counter()
        np.asarray(f(x))
        return time.perf_counter() - t0

    for lo, hi in chains.values():   # warm every executable before timing
        once(lo); once(hi)
    times = {k: ([], []) for k in chains}
    for _ in range(reps):
        for k, (lo, hi) in chains.items():
            times[k][0].append(once(lo))
            times[k][1].append(once(hi))
    out = {}
    for k, (lo_t, hi_t) in times.items():
        out[k] = (min(hi_t) - min(lo_t)) / (n_hi - n_lo)
        print(f"{k:{label_w}s} {out[k]*1e3:7.4f} ms")
    return out
