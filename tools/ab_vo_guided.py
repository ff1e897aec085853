"""A/B: VO-only accuracy -- guided matching + two-view refinement
(round-4 verdict task 6: VO-only drift was 11-16% of path, ~3x its SLAM
sibling, and only the scale-propagation family had been tried).

Variants over the frame-to-frame VO pipeline (models/visual_odometry.py),
full-trajectory ATE vs ground truth on all four committed sequences:
  base    : plain match + RANSAC essential (the round-4 default)
  guided  : proximity-gated matching (vo.guided_radius; the previous
            frame's position is the motion prediction)
  refine  : two-view pose refinement (vo.refine_two_view; motion-only BA
            against unit-baseline triangulations of the RANSAC inliers)
  g+r     : both

RESULT (2026-08-20, CPU, radius 0.10):
  {"seq": "eval_seq",  "base": 0.5005, "guided@0.1": 0.5006, "refine": 0.5005, "g+r": 0.5006}
  {"seq": "eval_seq2", "base": 0.6024, "guided@0.1": 0.6070, "refine": 0.6024, "g+r": 0.6070}
  {"seq": "eval_seq3", "base": 0.7923, "guided@0.1": 0.8051, "refine": 0.7923, "g+r": 0.8051}
  {"seq": "eval_seq4", "base": 0.7456, "guided@0.1": 0.7188, "refine": 0.7456, "g+r": 0.7188}
Verdict: a measured NEGATIVE on this scene family -- guided matching is
a wash (-0.027 on eval_seq4, +0.013 on eval_seq3, noise elsewhere) and
the two-view refinement is a no-op (its stricter reprojection inlier
count never beats RANSAC's Sampson count, so the accept gate never
fires). Consistent with the diagnostics: VO-only drift here is
dominated by the |t|=1 monocular step-scale convention (per-frame
step-length ratios 0.1-3x, tools/diag_tracking.py), NOT by match
quality (rotation errors ~0.2 deg) -- and the scale family was already
measured a wash (tools/ab_vo_scale.py). Both knobs default OFF; SLAM's
map-PnP supplies the scale VO cannot, which is why the SLAM sibling is
~3x more accurate on the same frames.

Run: python tools/ab_vo_guided.py [radius]
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
from pislam_tpu.models.visual_odometry import VisualOdometry
from pislam_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(seq, guided, refine):
    d = np.load(os.path.join(ROOT, "data", f"{seq}.npz"))
    frames, Rs, ts = d["frames"], d["Rs"], d["ts"]
    gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    cfg = slam_config(frames.shape[2], frames.shape[1])
    cfg = dc.replace(cfg, vo=dc.replace(
        cfg.vo, guided_radius=guided, refine_two_view=refine))
    vo = VisualOdometry(cfg, float(d["fx"]), float(d["fy"]),
                        float(d["cx"]), float(d["cy"]))
    state = vo.init(jnp.asarray(frames[0]), seed=0)
    est = [vo.camera_position(state)]
    for f in frames[1:]:
        state, _ = vo.process(state, jnp.asarray(f))
        est.append(vo.camera_position(state))
    return float(ate_rmse(np.stack(est), gt))


def main():
    radius = float(sys.argv[1]) if len(sys.argv) > 1 else 0.10
    for seq in ("eval_seq", "eval_seq2", "eval_seq3", "eval_seq4"):
        row = {"seq": seq,
               "base": round(run(seq, 0.0, False), 4),
               f"guided@{radius:g}": round(run(seq, radius, False), 4),
               "refine": round(run(seq, 0.0, True), 4),
               "g+r": round(run(seq, radius, True), 4)}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
