"""Per-frame tracking diagnostic against ground truth.

For each frame: tracking inliers, map-PnP inliers, keyframe/lost flags,
similarity-aligned positional residual, relative-rotation error vs gt,
and the est/gt step-length ratio. This is the tool that located the
eval_seq2 failure mode (round 4): residual concentrates on frames where
map inliers drop below min_map_inliers -- the unit-norm fallback then
injects phantom steps with step ratios up to 15x (fixed by
map.keyframe_on_map_dropout; see tools/ab_step_prior.py for the
pose-rescaling family that did NOT fix it).

Usage: python tools/diag_tracking.py [eval_seq|eval_seq2|eval_seq3]
"""
import os
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax.numpy as jnp
from eval_ate import slam_config
from pislam_tpu.models.slam import KeyframeSLAM
from pislam_tpu.evaluation import ate_rmse

seq = sys.argv[1] if len(sys.argv) > 1 else "eval_seq2"
d = np.load(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", f"{seq}.npz"))
frames, Rs, ts = d["frames"], d["Rs"], d["ts"]
fx, fy, cx, cy = (float(d["fx"]), float(d["fy"]), float(d["cx"]), float(d["cy"]))
gt_c = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
h, w = frames.shape[1:]
cfg = slam_config(w, h)
slam = KeyframeSLAM(cfg, fx, fy, cx, cy, keyframe_min_inliers=60, keyframe_max_gap=3)

rows = []
est_R = []
for i, f in enumerate(frames):
    info = slam.process(jnp.asarray(f))
    est_R.append(np.asarray(info["pose_R"]))
    rows.append((i, info["num_inliers"], info["map_inliers"],
                 int(info["keyframe"]), int(info["lost"])))

est_c = np.stack(slam.trajectory)

# similarity-align est to gt for positional residuals
def umeyama(est, gt):
    me, mg = est.mean(0), gt.mean(0)
    E, G = est - me, gt - mg
    U, S, Vt = np.linalg.svd(G.T @ E / len(est))
    dd = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1, 1, dd])
    R = U @ D @ Vt
    s = np.trace(np.diag(S) @ D) / (E ** 2).sum() * len(est)
    return lambda x: s * (x - me) @ R.T + mg

al = umeyama(est_c, gt_c)
res = np.linalg.norm(al(est_c) - gt_c, axis=1)

# per-frame relative rotation error: est R_i R_{i-1}^T vs gt
rot_err = [0.0]
for i in range(1, len(est_R)):
    dR_e = est_R[i] @ est_R[i - 1].T
    dR_g = Rs[i] @ Rs[i - 1].T
    cosang = (np.trace(dR_e @ dR_g.T) - 1) / 2
    rot_err.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))

# per-frame relative step-length ratio (est/gt), similarity scale applied
est_al = al(est_c)
step_e = np.linalg.norm(np.diff(est_al, axis=0), axis=1)
step_g = np.linalg.norm(np.diff(gt_c, axis=0), axis=1)
ratio = np.concatenate([[1.0], step_e / np.maximum(step_g, 1e-9)])

print(" i  inl map kf lost  res(m) dRot(deg) stepRatio")
for (i, inl, nm, kf, lost) in rows:
    print(f"{i:3d} {inl:4d} {nm:3d} {kf:2d} {lost:4d}  {res[i]:.3f}  "
          f"{rot_err[i]:7.2f}  {ratio[i]:6.2f}")
print("ATE:", round(float(ate_rmse(est_c, gt_c)), 4))
