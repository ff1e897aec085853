"""Chain-length linearity probe: is per-iteration time constant in N?

If (t(N2)-t(N1))/(N2-N1) differs across segments, differenced chain timings
are biased and the segment used must be reported with the number.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import load_demo as load

from pislam_tpu.frontend import _extract_impl


def main():
    cfg, stack_np, mask = load()
    stack = jnp.asarray(stack_np)
    lengths = [2, 12, 22, 42]

    def make_chain(n):
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

    chains = {n: make_chain(n) for n in lengths}

    def once(f):
        t0 = time.perf_counter()
        np.asarray(f(stack)[0])
        return time.perf_counter() - t0

    for f in chains.values():
        once(f)

    times = {n: [] for n in lengths}
    for _ in range(int(os.environ.get("AB_REPS", "16"))):
        for n, f in chains.items():
            times[n].append(once(f))
    mins = {n: min(t) for n, t in times.items()}
    for n in lengths:
        print(f"N={n:3d}  min={mins[n]*1e3:8.3f} ms")
    for a, b in zip(lengths, lengths[1:]):
        per = (mins[b] - mins[a]) / (b - a)
        print(f"segment {a:3d}->{b:3d}: {per*1e3:7.4f} ms/frame")


if __name__ == "__main__":
    main()
