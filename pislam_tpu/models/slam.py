"""Keyframe SLAM: tracking + local map + windowed BA (BASELINE.json configs[3]).

Architecture (grown from the reference's frontend-only scope, README.md:22,
per the north star):

* tracking: every frame is matched (Hamming, MXU) against the last keyframe
  and localised with RANSAC essential + cheirality (geometry/).
* mapping: when tracking weakens (few inliers) or the baseline grows, the
  frame is promoted to a keyframe; inlier matches against the previous
  keyframe are triangulated into landmarks (backend/triangulate.py).
* local BA: the sliding window of the last `window` keyframes, their
  landmarks and observations is refined with Schur-complement bundle
  adjustment (backend/ba.py) -- fixed-capacity masked arrays throughout, so
  the BA step is one compiled program reused every keyframe.
* loop closure: match_keyframe() detects revisits against the keyframe
  store, try_close_loop() adds the relative-pose edge and runs pose-graph GN
  over the trajectory (backend/pose_graph.py); relocalise() recovers the
  pose of a kidnapped frame from the map.

Host-side Python only orchestrates keyframe decisions (small scalar reads);
all heavy stages are jitted device programs. The image frontend is swappable
(`features_fn`) so tests can drive the full tracking+mapping+BA stack from a
synthetic projector with known ground truth.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from .. import matching
from ..backend import ba, pose_graph, triangulate
from ..config import PislamConfig
from ..geometry import ransac, se3
from .visual_odometry import VisualOdometry, normalise_points


@dataclasses.dataclass
class Keyframe:
    index: int       # keyframe ordinal
    frame: int       # source frame number
    R: np.ndarray
    t: np.ndarray
    feats: object    # frontend.Features
    pts: np.ndarray  # (K, 2) normalised


class KeyframeSLAM:
    def __init__(self, cfg: PislamConfig, fx, fy, cx, cy, features_fn=None,
                 keyframe_min_inliers: int = 60, keyframe_max_gap: int = 10):
        self.cfg = cfg
        self.vo = VisualOdometry(cfg, fx, fy, cx, cy, features_fn=features_fn)
        self.keyframe_min_inliers = keyframe_min_inliers
        self.keyframe_max_gap = keyframe_max_gap

        self.keyframes: List[Keyframe] = []
        self.trajectory: List[np.ndarray] = []  # camera positions per frame
        self.landmarks: List[np.ndarray] = []   # per-keyframe-pair batches
        self._frame_idx = 0
        self._since_kf = 0
        self._key = jax.random.PRNGKey(7)

        self._match = jax.jit(lambda d1, d2, v1, v2: matching.match(
            d1, d2, v1, v2, max_distance=cfg.matcher.max_distance,
            ratio=cfg.matcher.ratio, cross_check=cfg.matcher.cross_check))

    # -- internal ----------------------------------------------------------

    def _features(self, frame):
        feats = self.vo.extract(frame)
        pts = normalise_points(
            feats, self.vo.fx, self.vo.fy, self.vo.cx, self.vo.cy,
            self.vo.level_rows, self.vo.level_scales)
        return feats, np.asarray(pts)

    def _localise(self, kf: Keyframe, feats, pts):
        idx2, _ = self._match(kf.feats.descriptors, feats.descriptors,
                              kf.feats.valid, feats.valid)
        idx2 = np.asarray(idx2)
        ok = idx2 >= 0
        p1 = jnp.asarray(kf.pts)
        p2 = jnp.asarray(pts[np.clip(idx2, 0, None)])
        self._key, sub = jax.random.split(self._key)
        out = ransac.ransac_essential(
            sub, p1, p2, jnp.asarray(ok),
            iters=self.cfg.vo.ransac_iters,
            inlier_threshold=self.cfg.vo.inlier_threshold)
        return out, idx2

    # -- public ------------------------------------------------------------

    def process(self, frame):
        """Track one frame; returns dict with pose + bookkeeping."""
        feats, pts = self._features(frame)
        self._frame_idx += 1

        if not self.keyframes:
            kf = Keyframe(0, self._frame_idx - 1, np.eye(3, dtype=np.float32),
                          np.zeros(3, np.float32), feats, pts)
            self.keyframes.append(kf)
            self.trajectory.append(np.zeros(3))
            return {"pose_R": kf.R, "pose_t": kf.t, "keyframe": True,
                    "num_inliers": 0}

        kf = self.keyframes[-1]
        out, idx2 = self._localise(kf, feats, pts)
        n_inl = int(out["num_inliers"])
        Rrel = np.asarray(out["R"])
        trel = np.asarray(out["t"])
        trel = trel / max(np.linalg.norm(trel), 1e-9)

        R = Rrel @ kf.R
        t = Rrel @ kf.t + trel
        self.trajectory.append(-R.T @ t)
        self._since_kf += 1

        make_kf = (n_inl < self.keyframe_min_inliers
                   or self._since_kf >= self.keyframe_max_gap)
        if make_kf and n_inl >= self.cfg.vo.min_inliers:
            self._insert_keyframe(feats, pts, R, t, out, idx2, kf)
            self._since_kf = 0

        return {"pose_R": R, "pose_t": t, "keyframe": make_kf,
                "num_inliers": n_inl}

    def _insert_keyframe(self, feats, pts, R, t, ransac_out, idx2, prev_kf):
        new_kf = Keyframe(len(self.keyframes), self._frame_idx - 1,
                          R.astype(np.float32), t.astype(np.float32),
                          feats, pts)
        # triangulate inlier matches between prev_kf and new_kf
        inl = np.asarray(ransac_out["inliers"])
        sel = np.where(inl & (idx2 >= 0))[0]
        if len(sel):
            p1 = prev_kf.pts[sel]
            p2 = new_kf.pts[idx2[sel]]
            X = np.array(triangulate.triangulate_two_view(
                jnp.asarray(prev_kf.R), jnp.asarray(prev_kf.t),
                jnp.asarray(new_kf.R), jnp.asarray(new_kf.t),
                jnp.asarray(p1), jnp.asarray(p2)))
            self.landmarks.append({
                "xyz": X, "kf_a": prev_kf.index, "kf_b": new_kf.index,
                "uv_a": p1, "uv_b": p2})
        self.keyframes.append(new_kf)
        self._local_ba()

    def _assemble_window(self):
        """Pack the sliding window into a fixed-shape BAProblem."""
        bc = self.cfg.ba
        w = min(bc.window, len(self.keyframes))
        kfs = self.keyframes[-w:]
        base = kfs[0].index
        idx_of = {kf.index: i for i, kf in enumerate(kfs)}

        pts, cams, lpts, uvs = [], [], [], []
        for batch in self.landmarks:
            if batch["kf_a"] < base:
                continue
            k = len(batch["xyz"])
            start = len(pts)
            pts.extend(batch["xyz"])
            for j in range(k):
                cams.append(idx_of[batch["kf_a"]]); lpts.append(start + j)
                uvs.append(batch["uv_a"][j])
                cams.append(idx_of[batch["kf_b"]]); lpts.append(start + j)
                uvs.append(batch["uv_b"][j])

        P_, O = bc.max_points, bc.max_obs
        npts, nobs = min(len(pts), P_), min(len(uvs), O)
        points = np.zeros((P_, 3), np.float32)
        if npts:
            points[:npts] = np.asarray(pts[:npts], np.float32)
        obs_cam = np.zeros(O, np.int32)
        obs_pt = np.zeros(O, np.int32)
        obs_uv = np.zeros((O, 2), np.float32)
        obs_valid = np.zeros(O, bool)
        kept = [i for i in range(nobs) if lpts[i] < npts]
        for oi, i in enumerate(kept):
            obs_cam[oi] = cams[i]
            obs_pt[oi] = lpts[i]
            obs_uv[oi] = uvs[i]
            obs_valid[oi] = True

        C = bc.window
        Rs = np.broadcast_to(np.eye(3, dtype=np.float32), (C, 3, 3)).copy()
        ts = np.zeros((C, 3), np.float32)
        cam_valid = np.zeros(C, bool)
        for i, kf in enumerate(kfs):
            Rs[i], ts[i], cam_valid[i] = kf.R, kf.t, True
        pt_valid = np.zeros(P_, bool)
        pt_valid[:npts] = True

        prob = ba.BAProblem(
            R=jnp.asarray(Rs), t=jnp.asarray(ts), points=jnp.asarray(points),
            obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
            obs_uv=jnp.asarray(obs_uv), obs_valid=jnp.asarray(obs_valid),
            cam_valid=jnp.asarray(cam_valid), pt_valid=jnp.asarray(pt_valid),
        )
        return prob, kfs, npts

    def _local_ba(self):
        prob, kfs, npts = self._assemble_window()
        if npts == 0 or len(kfs) < 2:
            return
        out, _ = ba.bundle_adjust(prob, iters=self.cfg.ba.gn_iters,
                                  damping=self.cfg.ba.damping)
        Rn, tn = np.asarray(out.R), np.asarray(out.t)
        for i, kf in enumerate(kfs):
            kf.R, kf.t = Rn[i], tn[i]
        # write refined landmark positions back into their batches
        Xn = np.asarray(out.points)
        base = kfs[0].index
        pos = 0
        for batch in self.landmarks:
            if batch["kf_a"] < base:
                continue
            k = len(batch["xyz"])
            take = min(k, max(0, npts - pos))
            if take > 0:
                batch["xyz"][:take] = Xn[pos:pos + take]
            pos += k

    # -- loop closure / relocalisation --------------------------------------

    def match_keyframe(self, feats, pts, exclude_recent: int = 0,
                       min_matches: int = 30):
        """Match features against every stored keyframe; localise vs the best.

        Returns (kf_index, R_rel, t_rel_unit, num_inliers) where the relative
        pose maps the matched keyframe's camera to the query camera
        (translation up to monocular scale), or (-1, None, None, 0) when no
        keyframe reaches `min_matches` RANSAC-verified correspondences.
        Keyframes newer than `len - exclude_recent` are skipped (loop
        detection must not fire on the immediate past).
        """
        n = len(self.keyframes) - exclude_recent
        if n <= 0:
            return -1, None, None, 0
        counts = []
        for kf in self.keyframes[:n]:
            idx2, _ = self._match(kf.feats.descriptors, feats.descriptors,
                                  kf.feats.valid, feats.valid)
            counts.append(int(np.sum(np.asarray(idx2) >= 0)))
        best = int(np.argmax(counts))
        if counts[best] < min_matches:
            return -1, None, None, 0
        out, _ = self._localise(self.keyframes[best], feats, pts)
        n_inl = int(out["num_inliers"])
        if n_inl < max(self.cfg.vo.min_inliers, min_matches // 2):
            return -1, None, None, 0
        t = np.asarray(out["t"])
        t = t / max(np.linalg.norm(t), 1e-9)
        return best, np.asarray(out["R"]), t, n_inl

    def try_close_loop(self, min_matches: int = 40, exclude_recent: int = 3):
        """Detect a loop for the newest keyframe and optimise the pose graph.

        The loop edge's translation is monocular (unit norm); its scale is
        set from the current pose estimates of the two keyframes, so the
        edge corrects drift in direction/rotation rather than scale.
        Returns the matched keyframe index, or -1 if no loop was found.
        """
        if len(self.keyframes) < exclude_recent + 2:
            return -1
        cur = self.keyframes[-1]
        idx, R_rel, t_unit, _ = self.match_keyframe(
            cur.feats, cur.pts, exclude_recent=exclude_recent,
            min_matches=min_matches)
        if idx < 0:
            return -1
        old = self.keyframes[idx]
        # current-estimate baseline length sets the edge scale
        c_old = -old.R.T @ old.t
        c_cur = -cur.R.T @ cur.t
        scale = float(np.linalg.norm(c_cur - c_old))
        # RANSAC measures T_rel with x_cur = R_rel x_old + t_rel, i.e.
        # T_rel = X_cur X_old^-1 (camera-frame relative). The pose-graph edge
        # convention (edge_residuals / odometry edges) is Z = X_old^-1 X_cur,
        # so conjugate: Z = X_old^-1 (T_rel X_old). Passing T_rel directly
        # would inject error proportional to the keyframes' absolute rotation
        # (verified: perfect measurements left residual ~0.5 for
        # non-commuting rotations).
        t_rel = t_unit * scale
        R_edge = old.R.T @ R_rel @ old.R
        t_edge = old.R.T @ (R_rel @ old.t + t_rel - old.t)
        self.optimise_pose_graph(
            loop_edges=[(old.index, cur.index, R_edge, t_edge)])
        return idx

    def relocalise(self, frame, min_matches: int = 30):
        """Localise a frame against the keyframe map (kidnapped-robot case).

        Returns (R, t) world->camera, or None if no keyframe matches. The
        translation inherits the map's scale via the matched keyframe's
        stored pose plus a unit-norm relative offset (exact up to the
        monocular scale of that offset).
        """
        feats, pts = self._features(frame)
        idx, R_rel, t_unit, _ = self.match_keyframe(
            feats, pts, min_matches=min_matches)
        if idx < 0:
            return None
        kf = self.keyframes[idx]
        R = R_rel @ kf.R
        t = R_rel @ kf.t + t_unit
        return R, t

    def optimise_pose_graph(self, loop_edges=()):
        """Global pose-graph GN over keyframes with sequential odometry edges
        plus `loop_edges` = [(i, j, R_ij, t_ij), ...] relative constraints."""
        n = len(self.keyframes)
        if n < 2:
            return
        ei, ej, eR, et = [], [], [], []
        for a, b in zip(self.keyframes[:-1], self.keyframes[1:]):
            Ra_inv, ta_inv = se3.inverse(jnp.asarray(a.R), jnp.asarray(a.t))
            Rij, tij = se3.compose(Ra_inv, ta_inv,
                                   jnp.asarray(b.R), jnp.asarray(b.t))
            ei.append(a.index); ej.append(b.index)
            eR.append(np.asarray(Rij)); et.append(np.asarray(tij))
        for (i, j, Rij, tij) in loop_edges:
            ei.append(i); ej.append(j)
            eR.append(np.asarray(Rij, np.float32))
            et.append(np.asarray(tij, np.float32))
        g = pose_graph.PoseGraph(
            R=jnp.asarray(np.stack([kf.R for kf in self.keyframes])),
            t=jnp.asarray(np.stack([kf.t for kf in self.keyframes])),
            edge_i=jnp.asarray(np.int32(ei)), edge_j=jnp.asarray(np.int32(ej)),
            edge_R=jnp.asarray(np.stack(eR)), edge_t=jnp.asarray(np.stack(et)),
            edge_valid=jnp.ones(len(ei), bool),
            node_valid=jnp.ones(n, bool))
        g2, _ = pose_graph.optimize(g, iters=8, damping=1e-5)
        Rn, tn = np.asarray(g2.R), np.asarray(g2.t)
        for k, kf in enumerate(self.keyframes):
            kf.R, kf.t = Rn[k], tn[k]

    def keyframe_positions(self) -> np.ndarray:
        return np.stack([-kf.R.T @ kf.t for kf in self.keyframes])

    @property
    def keyframe_frames(self):
        """Source frame number of each keyframe."""
        return [kf.frame for kf in self.keyframes]
