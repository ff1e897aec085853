"""A/B: step-magnitude prior for map-PnP dropout frames, all sequences.

Diagnosis (2026-08-20, per-frame instrumented run on eval_seq2): the
residual keyframe ATE concentrates on frames where local-map PnP drops
below min_map_inliers -- there the keyframe-relative essential pose
places the frame at |t_rel| = 1 MAP unit from the keyframe, a phantom
step several times the true motion (21/56 frames fell back; step ratios
up to 15x at the sweep reversals). An ORACLE that replaces just the
fallback magnitude with the ground-truth step cut the online ATE
0.59 -> 0.35, so the magnitude is the error term, not the direction.

This runs KeyframeSLAM per sequence with vo.step_magnitude_prior off/on
(the realisable predictor: keyframe-interval speed x frames elapsed,
keyframe-anchored so the host loop and device scan stay
decision-identical, maturity-gated to num_kf >= 4).

RESULT (2026-08-20, CPU, committed real-texture sequences,
post-closure keyframe ATE):
  eval_seq  (tuning)   0.0866 -> 0.0866  (no mature dropouts; bit-equal)
  eval_seq2 (held-out) 0.4776 -> 0.4278  (-10%)
  eval_seq3 (held-out) 0.1039 -> 0.1604  (+54%)
Variants also measured and WORSE: prev-frame-relative step rescale
(breaks loop/scan parity at chunk boundaries AND regressed the tuning
seq 2x), ungated bootstrap fallbacks (bootstrap keyframe spacing IS the
unit convention; tuning seq 0.087 -> 0.17..0.30), cap-only clamping
(seq2 0.56, seq3 0.14). No realisable predictor is Pareto-better on
both held-out sequences, so the DEFAULT STAYS OFF.

ROUND-5 CLOSURE OF THIS THREAD: the Huber-robust windowed BA + the
two-camera monocular scale anchor (backend/ba.py, BAConfig.huber /
n_fixed) attacked the same error term from the MAP side -- dropout
frames take the phantom step, but robust BA no longer lets it poison
the keyframe geometry -- and took eval_seq2 ONLINE SLAM ATE to 0.351
(EVAL_r05.json), past the 0.40 target this prior family chased and
past its 0.43-vs-0.35 oracle gap. The scoped variant (rescale only on
dropout frames) is therefore moot on these sequences.

Usage: python tools/ab_step_prior.py eval_seq,eval_seq2,eval_seq3
"""
import os, sys, json, dataclasses as dc
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax.numpy as jnp
from eval_ate import slam_config
from pislam_tpu.models.slam import KeyframeSLAM
from pislam_tpu.evaluation import ate_rmse

seqs = sys.argv[1].split(",") if len(sys.argv) > 1 else ["eval_seq"]
for seq in seqs:
    d = np.load(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", f"{seq}.npz"))
    frames, Rs, ts = d["frames"], d["Rs"], d["ts"]
    fx, fy, cx, cy = (float(d["fx"]), float(d["fy"]), float(d["cx"]), float(d["cy"]))
    gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    h, w = frames.shape[1:]
    for prior in (False, True):
        cfg = slam_config(w, h)
        cfg = dc.replace(cfg, vo=dc.replace(cfg.vo, step_magnitude_prior=prior))
        slam = KeyframeSLAM(cfg, fx, fy, cx, cy, keyframe_min_inliers=60,
                            keyframe_max_gap=3)
        for f in frames:
            slam.process(jnp.asarray(f))
        kf_frames = slam.keyframe_frames
        gt_kf = gt[np.asarray(kf_frames)]
        slam_ate = float(ate_rmse(np.stack(slam.trajectory), gt))
        pre = float(ate_rmse(slam.keyframe_positions(), gt_kf))
        loop = slam.try_close_loop(min_matches=40, exclude_recent=3)
        if loop >= 0:
            slam.global_ba(); slam.cull_landmarks()
        post = float(ate_rmse(slam.keyframe_positions(), gt_kf))
        print(json.dumps({"seq": seq, "prior": prior, "loop": int(loop),
                          "slam_ate": round(slam_ate, 4),
                          "kf_pre": round(pre, 4),
                          "kf_post": round(post, 4)}), flush=True)
