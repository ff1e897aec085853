"""On-chip VO throughput: the device-resident sequence scan (make_vo_scan).

The Python-driven VO loop pays ~1-4 ms dispatch + ~30 ms sync per frame
through the tunnel; the scan pays one dispatch + one sync per SEQUENCE. A
scan of T frames is itself an in-jit chain with a hard sequential
dependency (each step matches against the previous frame's features), so
the verify-skill chain methodology applies directly: difference two scan
lengths, interleaved, minima (drift is +-40% between runs).

Runs on the committed 48-frame eval sequence (384x256, 4-level pyramid).
Prints one JSON line: frames/s of full VO (pyramid + extraction + matching
+ 256-hypothesis RANSAC + pose chaining).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import _bench_common  # noqa: F401  (compilation cache + sys.path)

from pislam_tpu.models.visual_odometry import make_vo_scan


def main():
    import os
    import sys
    sys.path.insert(0, os.path.join(_bench_common._REPO, "tools"))
    from eval_ate import slam_config

    d = np.load(os.path.join(_bench_common._REPO, "data", "eval_seq.npz"))
    frames = d["frames"]
    fx, fy, cx, cy = (float(d["fx"]), float(d["fy"]),
                      float(d["cx"]), float(d["cy"]))
    cfg = slam_config(frames.shape[2], frames.shape[1])
    run = make_vo_scan(cfg, fx, fy, cx, cy)

    t_lo, t_hi = 8, frames.shape[0]
    key = jax.random.PRNGKey(0)
    x_lo = jnp.asarray(frames[:t_lo])
    x_hi = jnp.asarray(frames)

    def once(x):
        t0 = time.perf_counter()
        out = run(x, key)
        np.asarray(out["t"])  # true host sync (block_until_ready lies here)
        return time.perf_counter() - t0

    once(x_lo); once(x_hi)  # warm both executables
    lo_t, hi_t = [], []
    reps = int(os.environ.get("AB_REPS", "16"))
    for _ in range(reps):
        lo_t.append(once(x_lo))
        hi_t.append(once(x_hi))
    per = (min(hi_t) - min(lo_t)) / (t_hi - t_lo)
    print(json.dumps({"metric": "vo_scan_fps", "value": round(1.0 / per, 1),
                      "unit": "frames/s",
                      "ms_per_frame": round(per * 1e3, 4),
                      "frames": int(t_hi),
                      "resolution": f"{frames.shape[2]}x{frames.shape[1]}"}))


if __name__ == "__main__":
    main()
