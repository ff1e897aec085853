"""Throwaway probe: attribute track_map_state cost at map-scale K2 —
full step vs fused match on pre-expanded descriptors vs expand_pm1 of
the database vs motion-only BA. One interleaved process."""
import sys
import dataclasses as dc

import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import interleaved_ab, xru32

from pislam_tpu import matching
from pislam_tpu.config import PislamConfig
from pislam_tpu.models.slam import track_map_state, project_landmarks
from pislam_tpu.ops import pallas_kernels as pk
from pislam_tpu.backend import pnp
from bench_map_scale import make_case

K2 = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
cfg = PislamConfig()
cfg = dc.replace(cfg, map=dc.replace(cfg.map, gate_radius=0.06))

lmap, feats, pts, R0, t0 = make_case(K2)
R0 = jnp.asarray(R0, jnp.float32)
t0 = jnp.asarray(t0, jnp.float32)
b_pre = jax.jit(matching.expand_pm1)(lmap.descriptors)
b_pre.block_until_ready()
uv2 = jax.jit(project_landmarks)(lmap, R0, t0)


def full(x):
    t = t0 + 1e-7 * x[:3].astype(jnp.float32)
    R, tt, n, assoc = track_map_state(cfg, lmap, feats, pts, R0, t)
    return (xru32(jax.lax.bitcast_convert_type(tt, jnp.uint32))
            ^ n.astype(jnp.uint32))


def match_pre(x):
    a = matching.expand_pm1(feats.descriptors)
    a = a.at[0, 0].set((x[0] & 1).astype(jnp.int8) * 2 - 1)
    best, second, idx, carg = pk.match_reduce(
        a, b_pre, feats.valid, lmap.valid, pts, uv2, 0.06)
    return xru32(best) ^ xru32(idx) ^ xru32(carg)


def expand_db(x):
    d = lmap.descriptors.at[0, 0].set(x[0].astype(jnp.uint32))
    return xru32(matching.expand_pm1(d))


def proj(x):
    t = t0 + 1e-7 * x[:3].astype(jnp.float32)
    return xru32(jax.lax.bitcast_convert_type(
        project_landmarks(lmap, R0, t), jnp.uint32))


def ba_only(x):
    t = t0 + 1e-7 * x[:3].astype(jnp.float32)
    xyz = lmap.xyz[:512]
    ok = feats.valid
    out = pnp.motion_only_ba(R0, t, xyz, pts, ok,
                             iters=cfg.map.pnp_iters,
                             inlier_threshold=cfg.map.pnp_inlier_threshold)
    return (xru32(jax.lax.bitcast_convert_type(out["t"], jnp.uint32))
            ^ out["num_inliers"].astype(jnp.uint32))


x0 = jnp.zeros(8, jnp.uint8)
import os
if not os.environ.get("SKIP_BASE"):
    interleaved_ab({"full": full, "match_pre": match_pre,
                    "expand_db": expand_db, "project": proj,
                    "ba_only": ba_only}, x0, n_lo=2, n_hi=22)

def match_expand_inside(x):
    a = matching.expand_pm1(feats.descriptors)
    a = a.at[0, 0].set((x[0] & 1).astype(jnp.int8) * 2 - 1)
    b = matching.expand_pm1(lmap.descriptors)
    best, second, idx, carg = pk.match_reduce(
        a, b, feats.valid, lmap.valid, pts, uv2, 0.06)
    return xru32(best) ^ xru32(idx) ^ xru32(carg)


def gated_full(x):
    idx, d = matching.match_gated(
        feats.descriptors, lmap.descriptors, feats.valid, lmap.valid,
        pts, uv2 + 1e-7 * x[0].astype(jnp.float32), 0.06,
        max_distance=cfg.map.map_match_max_distance,
        ratio=cfg.matcher.ratio, cross_check=True)
    return xru32(idx) ^ xru32(d)


interleaved_ab({"match_expand_in": match_expand_inside,
                "match_gated_api": gated_full}, x0, n_lo=2, n_hi=22)


def match_plus_ba(x):
    u2 = uv2 + 1e-7 * x[0].astype(jnp.float32)
    idx, d = matching.match_gated(
        feats.descriptors, lmap.descriptors, feats.valid, lmap.valid,
        pts, u2, 0.06,
        max_distance=cfg.map.map_match_max_distance,
        ratio=cfg.matcher.ratio, cross_check=True)
    ok = idx >= 0
    xyz = lmap.xyz[jnp.clip(idx, 0)]
    out = pnp.motion_only_ba(R0, t0, xyz, pts, ok,
                             iters=cfg.map.pnp_iters,
                             inlier_threshold=cfg.map.pnp_inlier_threshold)
    return (xru32(jax.lax.bitcast_convert_type(out["t"], jnp.uint32))
            ^ out["num_inliers"].astype(jnp.uint32))


def match_plus_gather(x):
    u2 = uv2 + 1e-7 * x[0].astype(jnp.float32)
    idx, d = matching.match_gated(
        feats.descriptors, lmap.descriptors, feats.valid, lmap.valid,
        pts, u2, 0.06,
        max_distance=cfg.map.map_match_max_distance,
        ratio=cfg.matcher.ratio, cross_check=True)
    xyz = lmap.xyz[jnp.clip(idx, 0)]
    return xru32(jax.lax.bitcast_convert_type(xyz, jnp.uint32)) ^ xru32(idx)


interleaved_ab({"match_plus_ba": match_plus_ba,
                "match_plus_gather": match_plus_gather,
                "match_pre2": match_pre,
                "full2": full}, x0, n_lo=1, n_hi=7)
