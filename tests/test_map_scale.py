"""Map scale: the sharded-map machinery at 512-keyframe / 131k-landmark /
1M-observation capacities (round-4 verdict task 3; SURVEY.md section 5
names map/trajectory scaling as this project's sequence-parallelism axis).

Earlier rounds proved the sharded paths CORRECT at the default 64/8k/16k
capacities; this module runs them at a scale where sharding is NECESSARY:
a pre-populated 512-slot keyframe ring, 131,072-landmark map and ~1M-row
observation table on the 8-virtual-device mesh -- map tracking (one
sharded gated matmul against all 131k landmark descriptors + PnP),
store-wide loop-detection counts over all 512 keyframes, landmark
culling, staleness eviction, compaction, keyframe culling and a live
keyframe insert all execute on the same state, with the invariants
checked after each. Wall-clock per stage is the CPU emulation's, not the
chip's -- tools/bench_map_scale.py measures the real-chip ms/frame at
16k/64k/131k.
"""

import dataclasses as dc

import numpy as np
import jax
import jax.numpy as jnp

from pislam_tpu.backend import keyframes as kfs
from pislam_tpu.config import (BAConfig, FrontendConfig, MapConfig,
                               MeshConfig, PislamConfig, PyramidConfig)
from pislam_tpu.frontend import Features
from pislam_tpu.models.slam import KeyframeSLAM, SlamState
from pislam_tpu.parallel.mesh import make_mesh

KF_CAP = 512
LM_CAP = 131072
OBS_CAP = 1 << 20
K = 512
WORDS = 8
N_KF = 384        # pre-populated keyframes (ring not yet wrapped)
N_LM = 120000     # pre-populated landmarks
N_OBS = 960000    # pre-populated observation rows


def big_cfg():
    return PislamConfig(
        pyramid=PyramidConfig(base_width=384, base_height=256, num_levels=4),
        frontend=FrontendConfig(fast_threshold=14, harris_threshold=1 << 9,
                                border=16, max_keypoints=K),
        ba=BAConfig(window=6, max_points=2048, max_obs=8192),
        map=MapConfig(keyframe_capacity=KF_CAP, max_landmarks=LM_CAP,
                      max_obs=OBS_CAP, gate_radius=0.06),
    )


def populate(cfg, seed=0):
    """A deterministic synthetic session at scale: keyframes along a
    line, landmarks in front of the path, obs rows tying them together
    with TRUE reprojections (so culling judges real residuals)."""
    rng = np.random.default_rng(seed)
    st = SlamState(
        store=kfs.empty_store(KF_CAP, K, WORDS),
        lmap=kfs.empty_map(LM_CAP, WORDS),
        obs=kfs.empty_obs(OBS_CAP),
        counters=jnp.zeros(5, jnp.int32),
        key=jax.random.PRNGKey(seed),
    )
    # keyframes: camera centres along x, identity-ish rotations
    t = np.zeros((KF_CAP, 3), np.float32)
    t[:N_KF, 0] = -0.05 * np.arange(N_KF)  # t = -R c, R = I
    desc = np.zeros((KF_CAP, K, WORDS), np.uint32)
    desc[:N_KF] = rng.integers(0, 2**31, (N_KF, K, WORDS),
                               dtype=np.int64).astype(np.uint32)
    kp_valid = np.zeros((KF_CAP, K), bool)
    kp_valid[:N_KF] = True
    pts = rng.uniform(-0.4, 0.4, (KF_CAP, K, 2)).astype(np.float32)
    store = st.store._replace(
        t=jnp.asarray(t),
        descriptors=jnp.asarray(desc),
        kp_valid=jnp.asarray(kp_valid),
        pts=jnp.asarray(pts),
        frame_id=jnp.asarray(np.where(np.arange(KF_CAP) < N_KF,
                                      np.arange(KF_CAP), -1)
                             .astype(np.int32)),
        ordinal=jnp.asarray(np.where(np.arange(KF_CAP) < N_KF,
                                     np.arange(KF_CAP), -1)
                            .astype(np.int32)),
        valid=jnp.asarray(np.arange(KF_CAP) < N_KF),
    )
    # landmarks: in front of the path (z ~ 4..8), distinct descriptors
    xyz = np.zeros((LM_CAP, 3), np.float32)
    xyz[:N_LM, 0] = rng.uniform(-20, 2, N_LM)
    xyz[:N_LM, 1] = rng.uniform(-2, 2, N_LM)
    xyz[:N_LM, 2] = rng.uniform(4, 8, N_LM)
    ldesc = np.zeros((LM_CAP, WORDS), np.uint32)
    ldesc[:N_LM] = rng.integers(0, 2**31, (N_LM, WORDS),
                                dtype=np.int64).astype(np.uint32)
    lmap = st.lmap._replace(
        xyz=jnp.asarray(xyz), descriptors=jnp.asarray(ldesc),
        valid=jnp.asarray(np.arange(LM_CAP) < N_LM),
        obs_count=jnp.asarray(
            np.where(np.arange(LM_CAP) < N_LM, 8, 0).astype(np.int32)))
    # observations: each row ties a random pre-populated (kf, lm) pair
    # with the TRUE reprojection of that landmark from that keyframe
    okf = rng.integers(0, N_KF, N_OBS).astype(np.int32)
    olm = rng.integers(0, N_LM, N_OBS).astype(np.int32)
    xc = xyz[olm] + t[okf]             # R = I
    ouv = (xc[:, :2] / xc[:, 2:3]).astype(np.float32)
    obs = st.obs._replace(
        kf=jnp.zeros(OBS_CAP, jnp.int32).at[:N_OBS].set(jnp.asarray(okf)),
        lm=jnp.zeros(OBS_CAP, jnp.int32).at[:N_OBS].set(jnp.asarray(olm)),
        uv=jnp.zeros((OBS_CAP, 2), jnp.float32).at[:N_OBS].set(
            jnp.asarray(ouv)),
        valid=jnp.asarray(np.arange(OBS_CAP) < N_OBS),
    )
    counters = jnp.asarray(
        np.int32([N_KF, N_LM, N_OBS, N_KF, 0]))
    return st._replace(store=store, lmap=lmap, obs=obs, counters=counters), \
        xyz, ldesc, t


def test_sharded_map_scale_session():
    cfg = big_cfg()
    mesh = make_mesh(MeshConfig(model_parallel=8),
                     devices=jax.devices()[:8])
    st, xyz, ldesc, t_kf = populate(cfg)

    # a features_fn stand-in is required by the constructor signature;
    # this test drives tracking through the sharded jitted pieces
    slam = KeyframeSLAM(cfg, 300.0, 300.0, 192.0, 128.0,
                        features_fn=lambda i: None, mesh=mesh)
    slam.set_state(st)
    assert slam.num_keyframes == N_KF
    assert slam.num_landmarks == N_LM

    # --- sharded map tracking against all 131k landmarks -----------------
    # synthetic query: 400 true landmark views from the LAST keyframe's
    # pose + 112 junk features
    rng = np.random.default_rng(1)
    R0 = np.eye(3, dtype=np.float32)
    t0 = np.asarray(t_kf[N_KF - 1])
    lm_pick = rng.choice(N_LM, 400, replace=False)
    xc = xyz[lm_pick] + t0
    front = xc[:, 2] > 1e-3
    fdesc = np.zeros((K, WORDS), np.uint32)
    fdesc[:400] = ldesc[lm_pick]
    fdesc[400:] = rng.integers(0, 2**31, (K - 400, WORDS),
                               dtype=np.int64).astype(np.uint32)
    fpts = np.zeros((K, 2), np.float32)
    fpts[:400] = xc[:, :2] / xc[:, 2:3]
    feats = Features(codes=jnp.zeros(K, jnp.uint32),
                     valid=jnp.asarray(np.arange(K) < 400),
                     angles=jnp.zeros(K, jnp.uint8),
                     descriptors=jnp.asarray(fdesc))
    Rm, tm, n_map, assoc = slam._track_map(
        slam._st.lmap, feats, jnp.asarray(fpts),
        jnp.asarray(R0), jnp.asarray(t0))
    n_map = int(n_map)
    assert n_map >= 300, n_map           # true views re-found at 131k scale
    assert np.isfinite(np.asarray(Rm)).all()
    a = np.asarray(assoc)
    hit = a[:400] >= 0
    assert (a[:400][hit] == lm_pick[hit]).mean() > 0.95  # right landmarks

    # --- store-wide loop detection over all 512 slots ---------------------
    counts = np.asarray(slam._store_counts(slam._st.store, feats))
    assert counts.shape == (KF_CAP,)
    assert counts[N_KF:].max(initial=0) == 0   # invalid slots never count

    # --- landmark culling at scale ---------------------------------------
    # corrupt 5000 landmarks; their true-reprojection rows now miss badly
    st2 = slam._st
    bad = rng.choice(N_LM, 5000, replace=False)
    xyz_bad = np.array(st2.lmap.xyz)
    xyz_bad[bad] += 5.0
    slam._st = st2._replace(lmap=st2.lmap._replace(
        xyz=jnp.asarray(xyz_bad)))
    culled = slam.cull_landmarks()
    assert culled >= 4000, culled
    assert not np.asarray(slam._st.lmap.valid)[bad].any()

    # --- staleness eviction + compaction ----------------------------------
    n_evicted = slam.evict_stale_landmarks(min_free=LM_CAP - N_LM + 20000)
    assert n_evicted > 0
    n_lm, n_obs = slam._num_lm, slam._num_obs
    assert n_lm <= N_LM - 20000 + 5000
    assert n_obs < N_OBS
    v = np.asarray(slam._st.lmap.valid)
    assert v[:n_lm].all() and not v[n_lm:].any()   # compacted to the front

    # --- keyframe culling --------------------------------------------------
    culled_kf = slam.cull_keyframes(max_cull=1, protect_recent=3)
    assert len(culled_kf) <= 1  # redundancy-gated; must not crash at scale

    # --- live insert on top of the big state -------------------------------
    kf_before = slam._num_kf
    lm_before = slam._num_lm
    idx2 = jnp.asarray(np.arange(K, dtype=np.int32))
    inl = jnp.asarray(np.arange(K) < 400)
    slam._insert_keyframe(feats, jnp.asarray(fpts), R0,
                          t0.astype(np.float32), idx2, inl,
                          (kf_before - 1) % KF_CAP,
                          map_idx=jnp.asarray(a))
    assert slam._num_kf == kf_before + 1
    assert slam._num_lm >= lm_before     # fresh triangulations may append
    assert slam._num_obs <= OBS_CAP
