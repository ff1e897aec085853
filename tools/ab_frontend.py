"""Interleaved in-context A/B of frontend upstream variants on the demo pyramid.

Variants are full _extract_impl pipelines differing only in
FrontendConfig.fused_upstream. Chains run in-jit with a non-foldable
dependency; lo/hi chain pairs for ALL variants are interleaved in one loop
and minima differenced (tunnel drift is +-40% between runs).
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import load_demo

import dataclasses

from pislam_tpu.frontend import _extract_impl


def make_chain(cfg, mask, n, orb_fn=None):
    from pislam_tpu.ops import brief

    @jax.jit
    def f(img):
        feats = None
        saved = brief.orb_compute_packed
        if orb_fn is not None:
            brief.orb_compute_packed = orb_fn
        try:
            for _ in range(n):
                feats = _extract_impl(img, mask, cfg)
                probe = jax.lax.reduce(
                    feats.descriptors, np.uint32(0),
                    jax.lax.bitwise_xor, (0, 1)) ^ feats.codes[0]
                img = img + (probe & 1).astype(jnp.uint8)
        finally:
            brief.orb_compute_packed = saved
        return feats.codes
    return f


def main():
    from pislam_tpu.ops import brief

    cfg, stack_np, mask = load_demo()
    stack = jnp.asarray(stack_np)
    n_lo, n_hi = 2, 22

    variants = {}
    import os as _os
    sel = _os.environ.get("AB_VARIANTS", "").split(",")
    allv = [
        ("xla+pallas-brief", False, None, "dense"),
        ("fused+pallas-brief", True, None, "dense"),
        ("fused+sorted-brief", True, None, "sorted"),
        ("xla+dense-brief", False, brief._orb_compute_packed_dense, "dense"),
        ("fused+dense-brief", True, brief._orb_compute_packed_dense, "dense"),
    ]
    if sel and sel[0]:
        allv = [v for v in allv if v[0] in sel]
    for name, fused, orb, bvar in allv:
        fc = dataclasses.replace(cfg.frontend, fused_upstream=fused,
                                 brief_variant=bvar)
        c = dataclasses.replace(cfg, frontend=fc)
        variants[name] = (make_chain(c, mask, n_lo, orb),
                         make_chain(c, mask, n_hi, orb))

    def once(f):
        t0 = time.perf_counter()
        np.asarray(f(stack)[0])
        return time.perf_counter() - t0

    for lo, hi in variants.values():  # warm all executables
        once(lo); once(hi)

    times = {k: ([], []) for k in variants}
    for _ in range(int(_os.environ.get("AB_REPS", "10"))):
        for k, (lo, hi) in variants.items():
            times[k][0].append(once(lo))
            times[k][1].append(once(hi))
    for k, (lo_t, hi_t) in times.items():
        per = (min(hi_t) - min(lo_t)) / (n_hi - n_lo)
        print(f"{k:20s} {per*1e3:7.4f} ms/frame  ({1/per:7.1f} fps)")


if __name__ == "__main__":
    main()
