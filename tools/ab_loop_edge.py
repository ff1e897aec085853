"""A/B: loop-closure edge construction -- estimate-scale vs map-refined
vs the production metric-PnP edge (round-3 verdict task 1c).

Three edge sources for the same detected loop, pose-graph-only ATE
(the full pipeline additionally runs global BA + cull afterwards):
  estimate : rotation from RANSAC, translation scaled by the current
             estimates' baseline |c_cur - c_old|
  refined  : loop pose refined against the CURRENT landmark map
             (motion-only BA) -- measures as a near-no-op historically,
             because the map has absorbed the drift
  pnp      : PRODUCTION (try_close_loop since round 3): metric PnP
             against the OLD keyframe's landmarks, edge weighted by its
             inlier support

RESULT (2026-08-20, real-texture sequences, keyframe_on_map_dropout on,
post-graph keyframe ATE; full-pipeline numbers are in EVAL_r04.json):
  eval_seq   pre 0.108: estimate 0.104  refined 0.109  pnp 0.103
  eval_seq2  pre 0.394: estimate 0.430  refined 0.422  pnp 0.426
  eval_seq3  pre 0.110: estimate 0.131  refined 0.107  pnp 0.146
All three constructions are equivalent within noise on every sequence --
on eval_seq2 ALL of them worsen post-graph because the remaining drift
sits below the edge's own measured error (tools/diag_loop_edge.py), and
on eval_seq/eval_seq3 the pipeline's global BA does the real work
(0.087 / 0.104 end states). The edge construction is NOT the lever;
production keeps the pnp edge for its metric scale and support weight.

Historical record (round 2, procedural texture, pre-PnP-edge):
  eval_seq pre 0.072 estimate 0.045 refined 0.075; eval_seq2 pre 0.154
  estimate 0.196 refined 0.154.

Run: python tools/ab_loop_edge.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

from pislam_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def run(seq, mode):
    import jax.numpy as jnp

    from eval_ate import slam_config
    from pislam_tpu.evaluation import ate_rmse
    from pislam_tpu.frontend import Features
    from pislam_tpu.models.slam import KeyframeSLAM

    d = np.load(seq)
    frames, Rs, ts = d["frames"], d["Rs"], d["ts"]
    intr = (float(d["fx"]), float(d["fy"]), float(d["cx"]), float(d["cy"]))
    gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    h, w = frames.shape[1:]
    cfg = slam_config(w, h)
    slam = KeyframeSLAM(cfg, *intr, keyframe_min_inliers=60,
                        keyframe_max_gap=3)
    for f in frames:
        slam.process(jnp.asarray(f))
    gtk = np.stack([gt[i] for i in slam.keyframe_frames])
    pre = ate_rmse(slam.keyframe_positions(), gtk)

    # try_close_loop's detection, with a switchable edge construction
    cur_slot = (slam._num_kf - 1) % slam.capacity
    desc, kvalid, pts, R_cur, t_cur = slam._slot_rows(cur_slot)
    feats_like = Features(
        codes=slam._st.store.codes[cur_slot], valid=kvalid,
        angles=jnp.zeros(kvalid.shape[0], jnp.uint8), descriptors=desc)
    idx, R_rel, t_unit, _ = slam.match_keyframe(
        feats_like, pts, exclude_recent=3, min_matches=40)
    if idx < 0:
        print(f"{seq}: no loop detected")
        return
    old_slot = idx % slam.capacity
    R_old = np.asarray(slam._st.store.R[old_slot])
    t_old = np.asarray(slam._st.store.t[old_slot])
    scale = float(np.linalg.norm(
        (-R_cur.T @ t_cur) - (-R_old.T @ t_old)))
    used = "estimate-scale"
    weight = 1.0
    if mode == "refined" and slam._num_lm > 0:
        R_meas = (R_rel @ R_old).astype(np.float32)
        t_meas = (R_rel @ t_old + t_unit * scale).astype(np.float32)
        Rm, tm, nmap, _ = slam._track_map(
            slam._st.lmap, feats_like, jnp.asarray(np.asarray(pts)),
            jnp.asarray(R_meas), jnp.asarray(t_meas))
        if int(nmap) >= cfg.map.min_map_inliers:
            R_edge = R_old.T @ np.asarray(Rm)
            t_edge = R_old.T @ (np.asarray(tm) - t_old)
            used = f"map-refined({int(nmap)} inliers)"
    elif mode == "pnp":
        # the PRODUCTION edge (try_close_loop since round 3): metric PnP
        # of the current view against the OLD keyframe's landmarks, edge
        # weighted by its inlier support
        R_meas = (R_rel @ R_old).astype(np.float32)
        t_meas = (R_rel @ t_old + t_unit * scale).astype(np.float32)
        pnp_pose = slam._loop_pnp_pose(
            old_slot, desc, kvalid, pts, R_meas, t_meas,
            min_inliers=max(cfg.map.min_map_inliers, 20))
        if pnp_pose is not None:
            R_meas, t_meas, n_sup = pnp_pose
            R_edge = R_old.T @ np.asarray(R_meas)
            t_edge = R_old.T @ (np.asarray(t_meas) - t_old)
            weight = float(n_sup)
            used = f"metric-pnp({int(n_sup)} inliers)"
    if used == "estimate-scale":
        t_rel = t_unit * scale
        R_edge = R_old.T @ R_rel @ R_old
        t_edge = R_old.T @ (R_rel @ t_old + t_rel - t_old)
    slam.optimise_pose_graph(
        loop_edges=[(idx, slam._num_kf - 1, R_edge, t_edge, weight)])
    post = ate_rmse(slam.keyframe_positions(), gtk)
    print(f"{os.path.basename(seq)} [{used}]: kf ATE pre {pre:.3f} -> "
          f"post {post:.3f} (loop -> kf {idx})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for seq in ("data/eval_seq.npz", "data/eval_seq2.npz",
                "data/eval_seq3.npz"):
        for mode in ("estimate", "refined", "pnp"):
            run(os.path.join(root, seq), mode)


if __name__ == "__main__":
    main()
