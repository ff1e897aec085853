"""A/B: VO step-scale convention on the committed sequences.

Round-3 verdict weak #6: VO-only drift on the held-out sequence stayed
~7% with the unit-norm per-transition scale convention
(models/visual_odometry.py) as the suspected error term. This runs the
frame-to-frame VO over all committed sequences twice -- unit-norm |t|=1
steps vs triangulated-depth scale propagation (vo.scale_propagation:
median depth ratio of features shared across three consecutive frames) --
and reports Umeyama-aligned ATE for both. Deterministic CPU run; the
trajectories differ by construction, not by device state, so this is a
plain accuracy A/B (no interleaving needed).

The earlier constant-velocity scale propagation A/B (regressed 2x,
models/slam.py:423) predicted scale from the PREVIOUS step; this one
measures it from the CURRENT step's shared-feature depths, which is the
standard monocular scale chain.

RESULT (2026-08-20, CPU, real-texture sequences): a wash --
  eval_seq   unit_norm 0.5005  scale_prop 0.5000
  eval_seq2  unit_norm 0.6024  scale_prop 0.6567
  eval_seq3  unit_norm 0.7923  scale_prop 0.7624
Diagnosis: at these frame rates the per-step baseline is ~2% of scene
depth, so triangulated depths are noise-dominated; the per-step scale
estimate correlates only 0.35 with the true step lengths (spot-checked,
jumps of 1.4-1.5x between adjacent steps survive the median). VO-only
drift here is NOT the scale convention -- it is the monocular floor of
narrow-baseline triangulation; metric scale is correctly anchored by the
SLAM map-PnP path instead (the kf ATE numbers). Default stays off.

Usage: python tools/ab_vo_scale.py  (add --cpu to force the CPU backend)
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from eval_ate import slam_config
    from pislam_tpu.evaluation import ate_rmse
    from pislam_tpu.models.visual_odometry import VisualOdometry
    from pislam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data")
    base = slam_config(384, 256)
    variants = {
        "unit_norm": base,
        "scale_prop": dataclasses.replace(
            base, vo=dataclasses.replace(base.vo, scale_propagation=True)),
    }

    for seq in ("eval_seq.npz", "eval_seq2.npz", "eval_seq3.npz"):
        d = np.load(os.path.join(data_dir, seq))
        frames, Rs, ts = d["frames"], d["Rs"], d["ts"]
        gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
        row = {"metric": "vo_scale_ab", "seq": seq,
               "frames": int(frames.shape[0])}
        for name, cfg in variants.items():
            vo = VisualOdometry(cfg, float(d["fx"]), float(d["fy"]),
                                float(d["cx"]), float(d["cy"]))
            st = vo.init(jnp.asarray(frames[0]), seed=0)
            est = [vo.camera_position(st)]
            for f in frames[1:]:
                st, _ = vo.process(st, jnp.asarray(f))
                est.append(vo.camera_position(st))
            row[name + "_ate"] = round(float(ate_rmse(np.stack(est), gt)), 4)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
