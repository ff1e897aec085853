"""Loop-edge quality vs ground truth: is closure physically able to help?

Runs KeyframeSLAM on a committed sequence, intercepts the loop edge
passed to optimise_pose_graph, and compares (a) the MEASURED edge
(metric PnP against the old keyframe's landmarks) and (b) the
DRIFTED-ESTIMATE relative pose against the ground-truth relative pose of
the closing keyframe pair, in metres (similarity scale from the keyframe
cloud). Closure can only improve ATE when the drifted error is well
above the measured-edge error; when they are comparable the pose graph
redistributes edge noise.

RESULT (2026-08-20, eval_seq2 with keyframe_on_map_dropout on):
  edge 0->20, weight 36: rot 1.15 deg (drifted 2.41), translation error
  0.239 m measured vs 0.451 m drifted -- the remaining drift is within
  ~2x the edge's own error, which is why post-graph ATE moves 0.394 ->
  0.426 and muting the edge 10x still gives 0.42 (EVAL_r04.json
  loop_edge_quality; the seq2 pin in tests/test_eval_sequence.py).

Usage: python tools/diag_loop_edge.py [eval_seq|eval_seq2|eval_seq3]
"""
import os, sys, json
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax.numpy as jnp
from eval_ate import slam_config
import pislam_tpu.models.slam as sm
from pislam_tpu.models.slam import KeyframeSLAM
from pislam_tpu.evaluation import ate_rmse

seq = sys.argv[1] if len(sys.argv) > 1 else "eval_seq2"
d = np.load(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", f"{seq}.npz"))
frames, Rs, ts = d["frames"], d["Rs"], d["ts"]
fx, fy, cx, cy = (float(d["fx"]), float(d["fy"]), float(d["cx"]), float(d["cy"]))
gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
h, w = frames.shape[1:]
cfg = slam_config(w, h)
slam = KeyframeSLAM(cfg, fx, fy, cx, cy, keyframe_min_inliers=60, keyframe_max_gap=3)
for f in frames:
    slam.process(jnp.asarray(f))

# intercept the pose-graph call to capture the loop edge
captured = {}
orig = KeyframeSLAM.optimise_pose_graph
def spy(self, loop_edges=()):
    captured["edges"] = loop_edges
    captured["views"] = self.keyframes
    return orig(self, loop_edges=loop_edges)
KeyframeSLAM.optimise_pose_graph = spy
loop = slam.try_close_loop(min_matches=40, exclude_recent=3)
KeyframeSLAM.optimise_pose_graph = orig
print("loop ->", loop)
views = captured["views"]
for (i, j, Rl, tl, wsup) in captured["edges"]:
    vi = next(v for v in views if v.index == i)
    vj = next(v for v in views if v.index == j)
    # estimated relative BEFORE closure (drifted): Z_est = X_i^-1 X_j
    Rrel_est = vi.R.T @ vj.R
    trel_est = vi.R.T @ (vj.t - vi.t)
    # gt relative between the frames of those keyframes
    fi, fj = vi.frame, vj.frame
    Rgi, tgi, Rgj, tgj = Rs[fi], ts[fi], Rs[fj], ts[fj]
    Rrel_gt = Rgi.T @ Rgj
    trel_gt = Rgi.T @ (tgj - tgi)
    # map scale: similarity scale of kf centers to gt
    est_c = slam.keyframe_positions()
    kfs = np.asarray(slam.keyframe_frames)
    gt_kf = gt[kfs]
    E = est_c - est_c.mean(0); G = gt_kf - gt_kf.mean(0)
    U, S, Vt = np.linalg.svd(G.T @ E / len(E))
    dd = np.sign(np.linalg.det(U @ Vt)); D = np.diag([1, 1, dd])
    s = np.trace(np.diag(S) @ D) / (E**2).sum() * len(E)   # metres per map unit
    def ang(Ra, Rb):
        c = (np.trace(Ra @ Rb.T) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))
    print(json.dumps({
        "edge": [int(i), int(j)], "weight": float(wsup),
        "metres_per_unit": round(float(s), 4),
        "rot_err_meas_deg": round(float(ang(Rl, Rrel_gt)), 3),
        "rot_err_drifted_deg": round(float(ang(Rrel_est, Rrel_gt)), 3),
        "t_meas_m": np.round(np.asarray(tl) * s, 3).tolist(),
        "t_drifted_m": np.round(trel_est * s, 3).tolist(),
        "t_gt_m": np.round(trel_gt, 3).tolist(),
        "t_err_meas_m": round(float(np.linalg.norm(np.asarray(tl) * s - trel_gt)), 3),
        "t_err_drifted_m": round(float(np.linalg.norm(trel_est * s - trel_gt)), 3),
    }))
