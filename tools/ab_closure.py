"""A/B: loop-closure mechanism -- pose-graph vs geometry-only (fused
observations + global BA), and the gt-free model selection between them
(round-4 verdict task 1: closure must never regress a held-out sequence).

For each committed sequence, runs tracking once, then from the SAME
snapshot: (A) _detect_loop fusion + global BA + cull (geometry-only
closure) and (B) the same plus pose-graph optimisation + re-triangulation
first (the graph closure). Reports keyframe ATE and the
KeyframeSLAM.map_consistency cost (mean Huber-robust reprojection cost
per observation) of both end states -- the metric close_loop uses to
pick a branch in production without ground truth.

RESULT (2026-08-20, huber BA + n_fixed=2 scale anchor): the graph branch
delivers the large correction only when drift dominates the edge noise;
when the anchor segment itself is misplaced (eval_seq2's degenerate
planar bootstrap: essential RANSAC returns 100% inlier support with a
77-deg-wrong translation direction) or drift sits at the edge-noise
floor, the graph REGRESSES ATE while branch A holds it. Two selection
traps were measured and fixed on the way to the committed design:
(1) with identical 2-round refinement the live-set costs separate the
harmful cases 7-150x (A/B cost in 1e-6 units: eval_seq 8.4/21.5,
eval_seq2 15.3/111.7, eval_seq3 3.2/3.3, eval_seq4 6.0/875.8) but the
seq3 near-tie is a coin flip -- hence the 0.9 margin in close_loop;
(2) with THREE refinement rounds the graph branch culled ~4k of its
worst rows on eval_seq4 and undercut branch A's live-set cost while its
ATE was 0.388-vs-0.339 worse (Goodhart) -- hence the judgement set is
FROZEN at the post-fusion observation table. Committed pipeline end
states (eval_ate.py, all four sequences, selection picked A everywhere):
  eval_seq   pre 0.1015 -> post 0.1029   (closure a no-op within noise)
  eval_seq2  pre 0.3520 -> post 0.3506   (round 4: 0.394 -> 0.426)
  eval_seq3  pre 0.1304 -> post 0.1022   (strict improvement retained)
  eval_seq4  pre 0.3393 -> post 0.3390   (round 4: 0.411 -> 0.422)
This tool re-measures the branch comparison with the production
close_loop internals.

Run: python tools/ab_closure.py [sequences...]
"""
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


def main():
    seqs = sys.argv[1:] or ["eval_seq", "eval_seq2", "eval_seq3",
                            "eval_seq4"]
    for seq in seqs:
        d = np.load(os.path.join(ROOT, "data", f"{seq}.npz"))
        frames, Rs, ts = d["frames"], d["Rs"], d["ts"]
        gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
        cfg = slam_config(frames.shape[2], frames.shape[1])
        slam = KeyframeSLAM(cfg, float(d["fx"]), float(d["fy"]),
                            float(d["cx"]), float(d["cy"]),
                            keyframe_min_inliers=60, keyframe_max_gap=3)
        for f in frames:
            slam.process(jnp.asarray(f))
        gtk = gt[np.asarray(slam.keyframe_frames)]
        pre = ate_rmse(slam.keyframe_positions(), gtk)
        snap = slam.state

        det = slam._detect_loop(min_matches=40, exclude_recent=3)
        if det is None:
            print(f"{seq}: pre {pre:.4f}  no loop detected", flush=True)
            continue
        idx, edges = det
        fused = slam.state  # snapshot AFTER fusion (shared by branches)
        import jax
        obs_ref = jax.device_get((fused.obs.kf, fused.obs.lm,
                                  fused.obs.uv, fused.obs.valid))

        def refine():  # identical to close_loop's
            for _ in range(3):
                slam.global_ba()
                slam.cull_landmarks()

        # branch A: geometry-only
        refine()
        ate_a = ate_rmse(slam.keyframe_positions(), gtk)
        cost_a, _ = slam.map_consistency(obs_ref)
        # branch B: pose graph + the identical refinement
        slam.set_state(fused)
        slam.optimise_pose_graph(loop_edges=edges)
        refine()
        ate_b = ate_rmse(slam.keyframe_positions(), gtk)
        cost_b, _ = slam.map_consistency(obs_ref)

        pick = "B(graph)" if cost_b < 0.9 * cost_a else "A(geom)"
        picked_ate = ate_b if pick.startswith("B") else ate_a
        right = picked_ate <= min(ate_a, ate_b) + 0.01
        print(f"{seq}: pre {pre:.4f}  A {ate_a:.4f}/{cost_a*1e6:.1f}u  "
              f"B {ate_b:.4f}/{cost_b*1e6:.1f}u  -> {pick}"
              f"{'' if right else '  (MISPICK)'}  loop {idx}", flush=True)
        del snap


if __name__ == "__main__":
    main()
