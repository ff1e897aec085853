"""A/B: chunked-scan accuracy -- boundary re-triangulation (round-4
verdict task 2).

The device-resident chunk scan (KeyframeSLAM.process_chunk) was the
FASTEST path but the least accurate one: in-chunk keyframe inserts
triangulate landmarks against poses windowed BA has not yet refined, and
boundary BA converges near that bad linearisation point instead of
undoing it (round 4 measured eval_seq4 chunk-8 online ATE 0.78 vs the
per-frame loop's 0.44; repeating boundary BA 3x only reached 0.75).
map.chunk_retriangulate resets the in-chunk landmarks from their first
two observations using the BA-refined poses, then runs BA once more
(models/slam.py:retriangulate_landmarks).

Runs eval_seq (48f) and eval_seq4 (224f, double loop + ring eviction)
with chunk sizes 1/4/8, retriangulation off vs on, and reports the
ONLINE full-trajectory ATE (every frame, as tracked -- no closure),
plus the per-frame host loop as the accuracy reference. CPU backend,
deterministic.

RESULT (2026-08-20, CPU, with the round-5 Huber BA + scale anchor):
  {"seq": "eval_seq",  "loop": 0.1431, "chunk4_off": 0.3806, "chunk4_on": 0.2137, "chunk8_off": 0.1726, "chunk8_on": 0.2097}
  {"seq": "eval_seq4", "loop": 0.3583, "chunk4_off": 0.3861, "chunk4_on": 0.4662, "chunk8_off": 0.3978, "chunk8_on": 0.4390}
Verdict: the HUBER windowed BA closed the round-4 chunk gap by itself --
eval_seq4 chunk-8 is 0.3978 vs the 0.3583 host loop (11%, inside the
round-4 target of <= 0.50 / ~15%), where round 4 measured 0.78 vs 0.44.
Re-triangulation (built for that gap) now HURTS on 3 of 4 cells
(resetting robust-BA-refined landmarks to raw two-view geometry discards
refinement; the eval_seq chunk-4 cell where it helps is the one spot a
bad early insert dominates) -- map.chunk_retriangulate defaults OFF and
the mechanism stays available for configs with sparser boundary BA.

Run: python tools/ab_chunk_accuracy.py
"""

import dataclasses as dc
import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from eval_ate import slam_config
from pislam_tpu.evaluation import ate_rmse
from pislam_tpu.models.slam import KeyframeSLAM
from pislam_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(seq, chunk, retri):
    d = np.load(os.path.join(ROOT, "data", f"{seq}.npz"))
    frames, Rs, ts = d["frames"], d["Rs"], d["ts"]
    gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    cfg = slam_config(frames.shape[2], frames.shape[1])
    cfg = dc.replace(cfg, map=dc.replace(cfg.map, chunk_retriangulate=retri))
    slam = KeyframeSLAM(cfg, float(d["fx"]), float(d["fy"]),
                        float(d["cx"]), float(d["cy"]),
                        keyframe_min_inliers=60, keyframe_max_gap=3)
    if chunk == 0:  # per-frame host loop (the accuracy reference)
        for f in frames:
            slam.process(jnp.asarray(f))
    else:
        for i in range(0, len(frames), chunk):
            slam.process_chunk(frames[i: i + chunk])
    return float(ate_rmse(np.stack(slam.trajectory), gt))


def main():
    for seq in ("eval_seq", "eval_seq4"):
        row = {"seq": seq, "loop": round(run(seq, 0, True), 4)}
        for chunk in (4, 8):
            row[f"chunk{chunk}_off"] = round(run(seq, chunk, False), 4)
            row[f"chunk{chunk}_on"] = round(run(seq, chunk, True), 4)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
