"""A/B: loop-closure edge scale source -- current-estimate vs map-refined.

The loop edge's translation magnitude cannot come from the monocular
RANSAC measurement (unit norm), so try_close_loop scales it by the current
estimates' baseline |c_cur - c_old| (models/slam.py). The obvious upgrade
-- refine the measured loop pose against the landmark map with motion-only
BA and build the edge from refined absolute poses -- was measured here and
NOT adopted:

    eval_seq   pre 0.072  estimate-scale post 0.045  map-refined post 0.075
    eval_seq2  pre 0.154  estimate-scale post 0.196  map-refined post 0.154

The map-refined edge is a no-op on both sequences (post ~= pre): the map
itself has absorbed the drift, so PnP against it converges back to the
drifted pose and the edge carries no correction. The estimate-scale edge
genuinely corrects rotation-dominated drift (eval_seq) but can
over-correct on a held-out loop (eval_seq2); the production answer is the
service pipeline -- pose graph, then global BA + cull, which recovers the
over-correction (tools/eval_ate.py reports both stages).

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


def run(seq, refine):
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
    if refine and slam._num_lm > 0:
        R_meas = (R_rel @ R_old).astype(np.float32)
        t_meas = (R_rel @ t_old + t_unit * scale).astype(np.float32)
        Rm, tm, nmap, _ = slam._track_map(
            slam._st.lmap, feats_like, jnp.asarray(np.asarray(pts)),
            jnp.asarray(R_meas), jnp.asarray(t_meas))
        if int(nmap) >= cfg.map.min_map_inliers:
            R_edge = R_old.T @ np.asarray(Rm)
            t_edge = R_old.T @ (np.asarray(tm) - t_old)
            used = f"map-refined({int(nmap)} inliers)"
    if used == "estimate-scale":
        t_rel = t_unit * scale
        R_edge = R_old.T @ R_rel @ R_old
        t_edge = R_old.T @ (R_rel @ t_old + t_rel - t_old)
    slam.optimise_pose_graph(
        loop_edges=[(idx, slam._num_kf - 1, R_edge, t_edge)])
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
    for seq in ("data/eval_seq.npz", "data/eval_seq2.npz"):
        for refine in (False, True):
            run(os.path.join(root, seq), refine)


if __name__ == "__main__":
    main()
