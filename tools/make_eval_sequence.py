"""Generate the committed evaluation sequences: data/eval_seq*.npz.

Three loop trajectories over a two-plane scene
(pislam_tpu.utils.render.PlaneScene), each ending at its exact starting
view so a SLAM run can detect and close the loop against the first
keyframe. Ground-truth world->camera poses are stored alongside the frames.

Textures are REAL image content by default: crops of the reference demo
photo (/root/reference/demo/input.png level 0, 640x480 -- the demo's
de-facto fixture, demo.cpp:51-57), tiled and cropped to the scene's
texture size. The procedural block texture remains available with
--texture procedural (it over-supplies perfect corners; the reference
grounds its numbers in real frames, README.md:109-112).

Variants:
  a (eval_seq.npz):  48-frame out-and-back loop -- the tuning sequence.
  b (eval_seq2.npz): 56-frame two-lobe sweep, stronger roll, deeper dolly,
                     different crops -- held-out.
  c (eval_seq3.npz): 88-frame double-length sweep (~9 m path, ~3x a/b)
                     -- the high-drift closure probe: substantial
                     odometric drift accumulates before the terminal
                     revisit, so loop closure has real error to remove.

Deterministic (fixed seeds/crops, pure numpy + the committed reference
PNG): re-running this script reproduces the artifacts byte-for-byte, so
they are auditable. Evaluate with tools/eval_ate.py (the README ATE
numbers).
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

DEMO_PNG = "/root/reference/demo/input.png"


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
    (0.9 m) over different texture crops. Used to check that parameters
    tuned on eval_seq (e.g. map.gate_radius) generalise; still ends at the
    starting view so loop closure applies."""
    i = np.arange(n)
    ph = i / (n - 1)
    sxs = 1.2 * np.sin(2 * np.pi * ph)
    rolls = np.deg2rad(25.0) * np.sin(3 * np.pi * ph)
    dzs = 0.9 * np.sin(np.pi * ph)
    return rolls, sxs, dzs


def trajectory_d(n=224):
    """Long-session probe: TWO full out-and-back passes (~11 m path,
    mirroring the reference's de-facto 200-frame benchmark length,
    reference README.md:109-112). The camera revisits the start view at
    mid-sequence AND at the end, and at keyframe_max_gap=3 the run
    inserts ~75+ keyframes -- past the default 64-slot ring, so keyframe
    EVICTION, landmark churn and closure-after-eviction are exercised at
    eval level (the 'long-context' analog of SURVEY.md section 5: map
    scaling under bounded state)."""
    i = np.arange(n)
    ph = i / (n - 1)
    sxs = 1.2 * np.sin(4 * np.pi * ph)
    rolls = np.deg2rad(20.0) * np.sin(4 * np.pi * ph)
    dzs = 0.9 * np.sin(2 * np.pi * ph) ** 2
    return rolls, sxs, dzs


def trajectory_c(n=88):
    """High-drift closure probe: a double-length figure sweep -- full
    +-1.4 m lateral period, three roll half-periods (+-20 degrees), a
    deep 1.1 m dolly lobe -- ~7.5 m of path (~2.4x variant a) before the
    terminal revisit, so real odometric drift accumulates for the loop
    closure to correct."""
    i = np.arange(n)
    ph = i / (n - 1)
    sxs = 1.4 * np.sin(2 * np.pi * ph)
    rolls = np.deg2rad(20.0) * np.sin(3 * np.pi * ph)
    dzs = 1.1 * np.sin(np.pi * ph) ** 2
    return rolls, sxs, dzs


# The texture is a SINGLE crop of the demo photo per plane -- no tiling,
# no mirroring. Mirror/rotation atlases were tried and MEASURED to break
# tracking: the flip-both quadrant of a 2x2 mirror tiling is an exact
# 180-degree-rotated copy, and rotated-BRIEF is rotation-COVARIANT, so the
# copy has identical descriptors (angle bin +15) -- the tracker locked
# onto it and flipped the trajectory ~175 degrees mid-sequence
# (eval_seq3 frame 45). Plain np.tile aliases under translation the same
# way. The foreground plane instead uses the NEGATED photo (ORB is not
# contrast-inversion invariant: FAST dark/light arcs swap, BRIEF bits
# invert, the centroid orientation rotates by pi), which keeps natural
# image statistics without any rotation/translation-equivalent copies.
MARGIN = 112  # (H + 2*112, W + 2*112) = (480, 608) fits level 0 (480, 640)


def demo_textures(bg_col: int, fg_col: int):
    """(bg, fg) (480, 608) crops of demo level 0 at the given column
    offsets (0..32); fg is negated (see module note)."""
    from PIL import Image

    img = np.asarray(Image.open(DEMO_PNG).convert("L"))
    lvl0 = img[:480, :640]
    tw = W + 2 * MARGIN
    return (lvl0[:, bg_col:bg_col + tw],
            (255 - lvl0[:, fg_col:fg_col + tw]).astype(np.uint8))


# variant -> (filename, seed, trajectory_fn, bg_col, fg_col)
VARIANTS = {
    "a": ("eval_seq.npz", 21, trajectory, 0, 32),
    "b": ("eval_seq2.npz", 5, trajectory_b, 16, 0),
    "c": ("eval_seq3.npz", 9, trajectory_c, 32, 16),
    "d": ("eval_seq4.npz", 13, trajectory_d, 8, 24),
}

# plane depths: pushed back from the render defaults (8, 4) so the
# texture excursion |ru| + fx*sx/z stays inside the 112-px margin at the
# trajectories' roll/sweep extremes (worst case 299 <= 304)
Z_BG, Z_FG = 10.0, 5.0


def make_scene(variant: str, texture: str = "demo") -> PlaneScene:
    """The exact scene behind a committed artifact (shared with the
    regeneration tests)."""
    _name, seed, _traj, bg_col, fg_col = VARIANTS[variant]
    textures = demo_textures(bg_col, fg_col) if texture == "demo" else None
    return PlaneScene(width=W, height=H, fx=FX, fy=FY, seed=seed,
                      z_bg=Z_BG, z_fg=Z_FG, margin=MARGIN,
                      textures=textures)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=sorted(VARIANTS), default="a")
    ap.add_argument("--texture", choices=("demo", "procedural"),
                    default="demo")
    args = ap.parse_args()
    name, _seed, traj = VARIANTS[args.variant][:3]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", name)
    scene = make_scene(args.variant, args.texture)
    rolls, sxs, dzs = traj()
    frames, Rs, ts = scene.render_trajectory(rolls, sxs, dzs)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, frames=frames, Rs=Rs, ts=ts,
                        fx=FX, fy=FY, cx=W / 2.0, cy=H / 2.0)
    print(f"wrote {out}: {frames.shape} frames, "
          f"{os.path.getsize(out) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
