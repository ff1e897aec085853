"""In-jit chain timing for the tunneled TPU (see .claude/skills/verify/SKILL.md).

Per-Python-dispatch overhead through the axon tunnel is 1-4 ms and
block_until_ready does not synchronise, so per-call timing is useless.
Methodology here:

  * build jits that run the op N times with a NON-FOLDABLE data dependency
    (feed `out & 1` back into the input so XLA cannot CSE iterations),
  * one host readback at the end (true sync),
  * difference two N and divide.

Report the min over several runs (tunnel scheduling noise is one-sided).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit_chain(op, x0, out_scalar, n_lo=2, n_hi=10, reps=4):
    """Median-free min-of-reps per-iteration device time of op(x).

    op: x -> out (pure jax function, not jitted)
    x0: example input (uint8 array)
    out_scalar: out -> scalar jax value used for the feed dependency.
        It must depend on EVERY output you want timed: outputs it does not
        touch are dead code in intermediate iterations and XLA deletes the
        stages producing them.
    """

    def make(n):
        @jax.jit
        def f(x):
            o = None
            for _ in range(n):
                o = op(x)
                x = x + (out_scalar(o) & 1).astype(x.dtype)
            return out_scalar(o)
        return f

    f_lo, f_hi = make(n_lo), make(n_hi)

    def run(f):
        o = f(x0)
        np.asarray(o)  # warm + sync
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            o = f(x0)
            np.asarray(o)
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(f_hi) - run(f_lo)) / (n_hi - n_lo)
