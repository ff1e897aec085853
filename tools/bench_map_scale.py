"""On-chip map-tracking cost vs map size (round-4 verdict task 3).

Times ``track_map_state`` — the production per-frame local-map tracking
stage (projection-gated Pallas match against ALL landmark descriptors +
motion-only-BA PnP, models/slam.py:track_map_state) — at landmark
capacities 16384 / 65536 / 131072 with the K=512 serving frontend config,
every variant interleaved in ONE process per the verify playbook
(in-jit chains with a feedback dependency, lo/hi lengths differenced,
minima over >=16 reps).

The map is synthetic but exercised honestly: 400 of the 512 query
features are true views (descriptor + sub-gate-radius reprojection) of
randomly chosen landmarks, the rest junk; each variant's tracked pose
must recover >= 300 PnP inliers before it is timed, so the timed path is
the one production takes (gate hit, ratio test, motion-only BA
convergence), not a degenerate all-miss short-circuit.

RESULT (2026-08-21, real chip, K1=512, gate 0.06, interleaved):
  16384 lm: 0.157 ms   65536 lm: 0.347 ms   131072 lm: 0.576 ms
(README "Where the cycles go" quotes this table; the 131k cell is the
matcher's two 65536-column segments (tools/ab_match_blocks.py) plus the
K2-independent PnP tail, so full-capacity tracking stays sub-ms.)

Run: python tools/bench_map_scale.py [sizes_csv]
"""
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import interleaved_ab, xru32

from pislam_tpu.backend import keyframes as kfs
from pislam_tpu.config import PislamConfig
from pislam_tpu.frontend import Features
from pislam_tpu.models.slam import track_map_state

K = 512
WORDS = 8
N_TRUE = 400


def make_case(n_lm, seed=0):
    """(lmap, feats, pts, R0, t0) with 400/512 query features being true
    gated views of random landmarks, per the module docstring."""
    rng = np.random.default_rng(seed)
    xyz = np.zeros((n_lm, 3), np.float32)
    xyz[:, 0] = rng.uniform(-3, 3, n_lm)
    xyz[:, 1] = rng.uniform(-2, 2, n_lm)
    xyz[:, 2] = rng.uniform(4, 8, n_lm)
    desc = rng.integers(0, 2**31, (n_lm, WORDS),
                        dtype=np.int64).astype(np.uint32)
    lmap = kfs.empty_map(n_lm, WORDS)._replace(
        xyz=jnp.asarray(xyz), descriptors=jnp.asarray(desc),
        valid=jnp.ones(n_lm, bool),
        obs_count=jnp.full(n_lm, 8, jnp.int32))
    pick = rng.choice(n_lm, N_TRUE, replace=False)
    uv_true = xyz[pick, :2] / xyz[pick, 2:3]
    fdesc = rng.integers(0, 2**31, (K, WORDS),
                         dtype=np.int64).astype(np.uint32)
    fdesc[:N_TRUE] = desc[pick]
    pts = rng.uniform(-0.4, 0.4, (K, 2)).astype(np.float32)
    pts[:N_TRUE] = uv_true + rng.normal(0, 0.002, (N_TRUE, 2))
    feats = Features(codes=jnp.zeros(K, jnp.uint32),
                     valid=jnp.ones(K, bool),
                     angles=jnp.zeros(K, jnp.uint8),
                     descriptors=jnp.asarray(fdesc))
    return lmap, feats, jnp.asarray(pts), jnp.eye(3), jnp.zeros(3)


def main():
    sizes = [int(s) for s in sys.argv[1].split(",")] if len(sys.argv) > 1 \
        else [16384, 65536, 131072]
    cfg = PislamConfig()
    assert cfg.map.gate_radius > 0 or True
    import dataclasses as dc
    cfg = dc.replace(cfg, map=dc.replace(cfg.map, gate_radius=0.06))

    ops = {}
    for n_lm in sizes:
        lmap, feats, pts, R0, t0 = make_case(n_lm)

        def op(x, lmap=lmap, feats=feats, pts=pts, R0=R0, t0=t0):
            # feedback perturbation: keeps the chain sequential, far below
            # the gate/inlier thresholds so every link does identical work
            t = t0 + 1e-7 * x[:3].astype(jnp.float32)
            R, tt, n, assoc = track_map_state(
                cfg, lmap, feats, pts, jnp.asarray(R0, jnp.float32), t)
            probe = (xru32(jax.lax.bitcast_convert_type(R, jnp.uint32))
                     ^ xru32(jax.lax.bitcast_convert_type(tt, jnp.uint32))
                     ^ n.astype(jnp.uint32))
            return probe

        # honesty gate: the timed path must actually track
        _, _, n, _ = jax.jit(
            lambda l=lmap, f=feats, p=pts, R=R0, t=t0:
            track_map_state(cfg, l, f, p,
                            jnp.asarray(R, jnp.float32),
                            jnp.asarray(t, jnp.float32)))()
        n = int(n)
        assert n >= 300, (n_lm, n)
        print(f"{n_lm:7d} landmarks: {n} PnP inliers (sanity ok)")
        ops[f"{n_lm}lm"] = op

    x0 = jnp.zeros(8, jnp.uint8)
    # n_hi=22: at sub-ms per-frame costs the default 12-link chain left
    # the differenced minima inside the tunnel's per-dispatch noise
    # (one 16k sample read 0.067 ms -- BELOW the step's own motion-only
    # BA, measured 0.11 ms in isolation; longer chains fixed the floor)
    out = interleaved_ab(ops, x0, n_lo=2, n_hi=22)
    print(json.dumps({
        "metric": "map_tracking_ms_per_frame",
        "value": {k: round(v * 1e3, 4) for k, v in out.items()},
        "unit": "ms/frame (gated match + motion-only BA, K1=512)",
        "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
