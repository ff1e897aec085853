"""Generate the committed evaluation sequence: data/eval_seq.npz.

A 48-frame out-and-back loop over the two-plane scene
(pislam_tpu.utils.render.PlaneScene): the camera sweeps laterally out to
+1.5 m and back (half-sine), rolls through +-18 degrees (full sine, three
angle bins each way), and dollies forward 0.5 m and back -- ending at the
exact starting view, so a SLAM run can detect and close the loop against
the first keyframe. Ground-truth world->camera poses are stored alongside
the frames.

Deterministic (fixed seeds, pure numpy): re-running this script reproduces
data/eval_seq.npz byte-for-byte, so the committed artifact is auditable.
Evaluate with tools/eval_ate.py (the README ATE numbers).

The reference has no dataset or trajectory evaluation (frontend-only,
README.md:22); this stands in for the TUM/KITTI-style evaluation its
downstream (a full SLAM) would need, per BASELINE.json configs[3].
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pislam_tpu.utils.render import PlaneScene  # noqa: E402

N = 48
W, H = 384, 256
FX = FY = 256.0


def trajectory(n=N):
    """(rolls_rad, sxs, dzs): out-and-back loop, start view == end view."""
    i = np.arange(n)
    ph = i / (n - 1)
    sxs = 1.5 * np.sin(np.pi * ph)
    rolls = np.deg2rad(18.0) * np.sin(2 * np.pi * ph)
    dzs = 0.5 * np.sin(np.pi * ph)
    return rolls, sxs, dzs


def trajectory_b(n=56):
    """Held-out variant: a two-lobe lateral sweep (+1.2 m then -1.2 m),
    stronger roll (+-25 degrees, three half-periods) and a deeper dolly
    (0.9 m) over a DIFFERENT scene (seed 5). Used to check that parameters
    tuned on eval_seq (e.g. map.gate_radius) generalise; still ends at the
    starting view so loop closure applies."""
    i = np.arange(n)
    ph = i / (n - 1)
    sxs = 1.2 * np.sin(2 * np.pi * ph)
    rolls = np.deg2rad(25.0) * np.sin(3 * np.pi * ph)
    dzs = 0.9 * np.sin(np.pi * ph)
    return rolls, sxs, dzs


VARIANTS = {
    "a": ("eval_seq.npz", 21, trajectory),
    "b": ("eval_seq2.npz", 5, trajectory_b),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=sorted(VARIANTS), default="a")
    args = ap.parse_args()
    name, seed, traj = VARIANTS[args.variant]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", name)
    scene = PlaneScene(width=W, height=H, fx=FX, fy=FY, seed=seed)
    rolls, sxs, dzs = traj()
    frames, Rs, ts = scene.render_trajectory(rolls, sxs, dzs)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, frames=frames, Rs=Rs, ts=ts,
                        fx=FX, fy=FY, cx=W / 2.0, cy=H / 2.0)
    print(f"wrote {out}: {frames.shape} frames, "
          f"{os.path.getsize(out) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
