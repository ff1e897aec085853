"""SLAM service CLI: run, telemetry, trajectory export, checkpoint/resume.

Drives pislam_tpu.service.main on the committed sequence (the same config
test_eval_sequence compiles, so executables come from the persistent
cache). Covers the TUM trajectory round-trip and the kill-and-rerun resume
path the service exists for.
"""

import json
import os

import numpy as np

from pislam_tpu import service
from pislam_tpu.io.datasets import (load_tum_trajectory,
                                    rotation_to_quaternion,
                                    save_tum_trajectory)

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "eval_seq.npz")


def _quat_rotate(q, v):
    """Rotate v by unit quaternion q=(x,y,z,w) -- independent oracle."""
    x, y, z, w = q
    u = np.array([x, y, z])
    return v + 2 * np.cross(u, np.cross(u, v) + w * v)


def test_rotation_to_quaternion_all_branches():
    from pislam_tpu.geometry import se3
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    # random rotations + near-180-degree ones to hit every Shepperd branch
    ws = list(rng.normal(0, 1.5, (8, 3)))
    ws += [np.array([np.pi - 1e-4, 0, 0]), np.array([0, np.pi - 1e-4, 0]),
           np.array([0, 0, np.pi - 1e-4])]
    for w in ws:
        R = np.asarray(se3.so3_exp(jnp.asarray(w, jnp.float32)), np.float64)
        q = rotation_to_quaternion(R)
        for v in np.eye(3):
            np.testing.assert_allclose(_quat_rotate(q, v), R @ v, atol=1e-5)


def test_tum_trajectory_roundtrip(tmp_path):
    from pislam_tpu.geometry import se3
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    Rs = [np.asarray(se3.so3_exp(jnp.asarray(w, jnp.float32)))
          for w in rng.normal(0, 0.5, (5, 3))]
    ts = [rng.normal(0, 1, 3).astype(np.float32) for _ in range(5)]
    path = str(tmp_path / "traj.txt")
    save_tum_trajectory(path, range(5), Rs, ts)
    stamps, xyz = load_tum_trajectory(path)
    assert stamps.shape == (5,)
    want = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    np.testing.assert_allclose(xyz, want, atol=1e-5)


def test_service_run_and_resume(tmp_path, capsys):
    traj = str(tmp_path / "traj.txt")
    ckpt = str(tmp_path / "ckpt")

    # run 1: five frames with checkpoints every 2 (last checkpoint at 4)
    service.main(["--seq", DATA, "--max-frames", "5",
                  "--checkpoint-dir", ckpt, "--checkpoint-every", "2"])
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["frames"] == 5 and r1["resumed_at"] == 0
    assert r1["keyframes"] >= 2

    # run 2 ("restarted process"): extends to 8 frames, resumes from ckpt
    service.main(["--seq", DATA, "--max-frames", "8",
                  "--checkpoint-dir", ckpt, "--checkpoint-every", "2",
                  "--traj-out", traj, "--metrics"])
    cap = capsys.readouterr()
    r2 = json.loads(cap.out.strip().splitlines()[-1])
    assert r2["resumed_at"] == 5
    assert r2["keyframes"] >= r1["keyframes"]
    # per-frame telemetry went to stderr as JSON lines
    mlines = [l for l in cap.err.splitlines() if l.startswith("{")]
    assert len(mlines) == 3  # frames 5..7
    assert all("time_ms.extract" in json.loads(l) for l in mlines)
    # trajectory holds the frames processed in THIS run
    stamps, xyz = load_tum_trajectory(traj)
    assert stamps.tolist() == [5.0, 6.0, 7.0]
    assert np.isfinite(xyz).all()


def test_service_full_sequence_reports_ate(capsys):
    service.main(["--seq", DATA, "--max-frames", "12"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["frames"] == 12
    assert "ate_rmse" in rep and rep["ate_rmse"] < 0.5


def test_service_midrun_loop_closure(capsys):
    """--loop-every closes the out-and-back loop DURING the run."""
    service.main(["--seq", DATA, "--chunk", "8", "--loop-every", "2",
                  "--no-loop-close"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["frames"] == 48
    assert rep["loops_closed_midrun"] >= 1
    assert "ate_rmse" in rep and rep["ate_rmse"] < 0.5


def test_service_maintenance_evicts_stale_landmarks(capsys, monkeypatch):
    """Long-session maintenance: with a small landmark table the
    --cull-every block evicts the stalest landmarks to keep
    --min-free-landmarks slots free (triangulation never starves), and
    the run stays finite."""
    import dataclasses as dc

    real = service.build_config

    def small(*a, **kw):
        cfg = real(*a, **kw)
        return dc.replace(cfg, map=dc.replace(
            cfg.map, max_landmarks=768, max_obs=3072))

    monkeypatch.setattr(service, "build_config", small)
    service.main(["--seq", DATA, "--cull-every", "2",
                  "--min-free-landmarks", "256", "--no-loop-close"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["frames"] == 48
    assert rep["landmarks_evicted"] > 0, rep
    assert rep["landmarks"] <= 768
    assert rep["frames_lost"] == 0
    assert "ate_rmse" in rep and rep["ate_rmse"] is not None


def test_service_chunked_scan_mode(tmp_path, capsys):
    """--chunk N drives the device-resident tracking scan."""
    traj = str(tmp_path / "traj.txt")
    service.main(["--seq", DATA, "--max-frames", "12", "--chunk", "6",
                  "--traj-out", traj])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["frames"] == 12 and rep["resumed_at"] == 0
    assert rep["keyframes"] >= 2
    assert "ate_rmse" in rep and rep["ate_rmse"] < 0.5
    stamps, xyz = load_tum_trajectory(traj)
    assert stamps.shape == (12,) and np.isfinite(xyz).all()


def test_service_map_export(tmp_path, capsys):
    """--map-out writes a valid PLY of landmarks + red keyframe path."""
    ply = str(tmp_path / "map.ply")
    service.main(["--seq", DATA, "--max-frames", "8", "--map-out", ply,
                  "--no-loop-close"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    lines = open(ply).read().splitlines()
    assert lines[0] == "ply" and "end_header" in lines
    n = int(next(l for l in lines if l.startswith("element vertex"))
            .split()[-1])
    body = lines[lines.index("end_header") + 1:]
    assert len(body) == n
    assert n == rep["landmarks"] + rep["keyframes"]
    # keyframe path entries are painted red and parse as floats
    reds = [l for l in body if l.endswith(" 255 0 0")]
    assert len(reds) == rep["keyframes"]
    vals = np.array([l.split()[:3] for l in body], dtype=np.float64)
    assert np.isfinite(vals).all()


def test_service_sharded_map_mode(capsys):
    """--model-parallel 2 (sharded landmark map + keyframe store over the
    virtual mesh) produces the same keyframe decisions as single-device."""
    service.main(["--seq", DATA, "--max-frames", "10", "--no-loop-close"])
    single = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    service.main(["--seq", DATA, "--max-frames", "10", "--no-loop-close",
                  "--model-parallel", "2"])
    sharded = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sharded["keyframes"] == single["keyframes"]
    assert sharded["landmarks"] == single["landmarks"]
    assert abs(sharded["ate_rmse"] - single["ate_rmse"]) < 2e-3


def test_service_localization_only_with_map_in(tmp_path, capsys):
    """Build a map with a normal run (--checkpoint-dir), then run
    --localization-only --map-in against it: the whole stream is processed
    (no frame-progress resume) and the map stays frozen."""
    ckpt = str(tmp_path / "ckpt")
    service.main(["--seq", DATA, "--max-frames", "10",
                  "--checkpoint-dir", ckpt, "--checkpoint-every", "5"])
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["keyframes"] >= 3

    service.main(["--seq", DATA, "--max-frames", "10",
                  "--localization-only", "--map-in", ckpt])
    loc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # every frame processed against the loaded map, nothing inserted
    assert loc["resumed_at"] == 0
    assert loc["keyframes"] == built["keyframes"]
    assert loc["landmarks"] == built["landmarks"]
    assert loc["loop_closed_to_kf"] == -1  # frozen map: no loop closure
    assert "ate_rmse" in loc and loc["ate_rmse"] < 0.5
