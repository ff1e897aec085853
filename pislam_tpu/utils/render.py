"""Synthetic two-plane scene renderer with exact ground-truth poses.

The reference ships no dataset; its de-facto fixtures are synthetic images
(GaussianTest.cpp:153-156 random fills, demo/input.png). For trajectory-level
evaluation we need *sequences* with known poses, so this renders a textured
fronto-parallel two-plane scene (background at Z_BG, a foreground band at
Z_FG for depth parallax) under camera roll about the optical axis, lateral
translation and forward dolly -- enough degrees of freedom to exercise
rotated-BRIEF invariance, essential-matrix estimation, triangulation and
loop closure, while keeping the inverse pixel map analytic (no ray casting).

Camera model: world->cam x_c = R_z(roll) (X - c), c = (sx, 0, dz). A plane
at depth Z maps frame pixels to frame-0 texture coordinates by the inverse
roll about the principal point, an unzoom by Z/(Z - dz), and a lateral
shift of fx*sx/Z texture pixels.

Used by tests/test_rotation_e2e.py and tools/make_eval_sequence.py (the
committed evaluation sequence behind the README ATE numbers).
"""

from __future__ import annotations

import numpy as np


class PlaneScene:
    """A renderable two-plane scene for a fixed intrinsic/view size."""

    def __init__(self, width: int = 384, height: int = 256,
                 fx: float = 256.0, fy: float = 256.0,
                 z_bg: float = 8.0, z_fg: float = 4.0,
                 margin: int = 160, seed: int = 0, textures=None):
        """``textures`` = (bg, fg) uint8 arrays of shape
        (height + 2*margin, width + 2*margin) to render REAL image content
        (e.g. crops of the reference demo photo) instead of the procedural
        block pattern; None keeps the seeded procedural textures."""
        self.w, self.h = width, height
        self.fx, self.fy = fx, fy
        self.cx, self.cy = width / 2.0, height / 2.0
        self.z_bg, self.z_fg = z_bg, z_fg
        self.margin = margin
        if textures is None:
            self.bg = blocky_texture(height + 2 * margin,
                                     width + 2 * margin, seed * 2 + 1)
            self.fg = blocky_texture(height + 2 * margin,
                                     width + 2 * margin, seed * 2 + 2)
        else:
            bg, fg = textures
            want = (height + 2 * margin, width + 2 * margin)
            assert bg.shape == want and fg.shape == want, \
                (bg.shape, fg.shape, want)
            self.bg = np.asarray(bg, np.uint8)
            self.fg = np.asarray(fg, np.uint8)

    def render(self, roll_rad: float, sx: float, dz: float) -> np.ndarray:
        """One (H, W) uint8 frame at camera centre (sx, 0, dz), roll about
        the optical axis."""
        w, h, m = self.w, self.h, self.margin
        u = np.arange(w)[None, :] - self.cx
        v = np.arange(h)[:, None] - self.cy
        c, s = np.cos(roll_rad), np.sin(roll_rad)
        ru = c * u + s * v
        rv = -s * u + c * v
        frame = np.zeros((h, w), np.float64)
        for tex, Z, is_fg in ((self.bg, self.z_bg, False),
                              (self.fg, self.z_fg, True)):
            zoom = Z / (Z - dz)
            shift = self.fx * sx / Z
            tx = ru / zoom + shift + self.cx + m
            ty = rv / zoom + self.cy + m
            layer = bilinear_sample(tex, tx, ty)
            if is_fg:
                band = (ty - m >= h / 4) & (ty - m < 3 * h / 4)
                frame = np.where(band, layer, frame)
            else:
                frame = layer
        return np.clip(np.round(frame), 0, 255).astype(np.uint8)

    def render_trajectory(self, rolls_rad, sxs, dzs):
        """Frames + ground truth for per-frame (roll, sx, dz) arrays.

        Returns (frames (N, H, W) u8, Rs (N, 3, 3) f32, ts (N, 3) f32) with
        world->camera convention x_c = R X + t, t = -R c.
        """
        frames, Rs, ts = [], [], []
        for th, sx, dz in zip(rolls_rad, sxs, dzs):
            frames.append(self.render(float(th), float(sx), float(dz)))
            c, s = np.cos(th), np.sin(th)
            # so3_exp([0, 0, th]): the convention the e2e tests verify the
            # estimated poses against
            R = np.float32([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            cc = np.float32([sx, 0.0, dz])
            Rs.append(R)
            ts.append((-R @ cc).astype(np.float32))
        return np.stack(frames), np.stack(Rs), np.stack(ts)


def blocky_texture(h: int, w: int, seed: int) -> np.ndarray:
    """Random block texture: strong corners at two scales (FAST-friendly)."""
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 256, (h // 8, w // 8), np.uint8)
    t = np.kron(t, np.ones((8, 8), np.uint8))
    t2 = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    t2 = np.kron(t2, np.ones((2, 2), np.uint8))
    return ((t.astype(np.int32) + t2.astype(np.int32)) // 2).astype(np.uint8)


def bilinear_sample(tex: np.ndarray, xs: np.ndarray, ys: np.ndarray):
    """Bilinear sample tex at float coords (ys, xs), clipped to edges."""
    h, w = tex.shape
    xs = np.clip(xs, 0.0, w - 1.001)
    ys = np.clip(ys, 0.0, h - 1.001)
    x0 = xs.astype(np.int64)
    y0 = ys.astype(np.int64)
    fx = xs - x0
    fy = ys - y0
    t = tex.astype(np.float64)
    return (t[y0, x0] * (1 - fx) * (1 - fy) + t[y0, x0 + 1] * fx * (1 - fy)
            + t[y0 + 1, x0] * (1 - fx) * fy + t[y0 + 1, x0 + 1] * fx * fy)
