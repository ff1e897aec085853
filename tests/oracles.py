"""Independent numpy oracles implementing the reference semantics literally.

Each oracle follows the C++ control flow per pixel / per candidate (the
opposite style to pislam_tpu's dense vector programs), so agreement between
the two is strong evidence of behavioural parity. Golden-model structure
mirrors the reference's own tests (GaussianTest.cpp:159-215,
BilinearTest.cpp:171-233) and, for the untested stages, the reference
implementation itself (Fast.h, Harris.h, Orb.h, Brief.h).
"""

from __future__ import annotations

import numpy as np


def rhadd(a, b):
    return (int(a) + int(b) + 1) >> 1


def gaussian5x5(img: np.ndarray) -> np.ndarray:
    """Scalar RHADD-chain golden model (GaussianTest.cpp:159-215)."""
    m = img.astype(np.int64).copy()

    def blur_axis_vertical(m):
        h, w = m.shape
        out = m.copy()
        for j in range(w):
            a, b, c, d = m[2, j], m[1, j], m[0, j], m[1, j]
            for i in range(h):
                if i == h - 2:
                    e = c
                elif i == h - 1:
                    e = a
                else:
                    e = m[i + 2, j]
                x = rhadd(a, e)
                y = rhadd(b, d)
                x = rhadd(x, c)
                x = rhadd(x, c)
                out[i, j] = rhadd(x, y)
                a, b, c, d = b, c, d, e
        return out

    m = blur_axis_vertical(m)
    m = blur_axis_vertical(m.T).T
    return m.astype(np.uint8)


def gaussian5x5_fast(img: np.ndarray) -> np.ndarray:
    """Vectorized equivalent of :func:`gaussian5x5` for the exhaustive
    dimension sweep (GaussianTest.cpp:153-156 runs all (16..63)^2 shapes;
    the scalar oracle is far too slow for 2304 shapes).

    Written independently of both the scalar oracle (explicit reflect index
    arithmetic instead of the rolling five-register window) and the
    production kernel (no jnp.pad); ``test_scalar_vs_vectorized_golden``
    anchors it to the scalar oracle.
    """

    def rh(a, b):
        return (a + b + 1) >> 1

    def blur_vertical(m):
        h = m.shape[0]
        # reflect-101: -2,-1 -> 2,1 and h,h+1 -> h-2,h-3
        idx = np.abs(np.arange(-2, h + 2))
        idx = np.where(idx >= h, 2 * h - 2 - idx, idx)
        p = m[idx]
        a, b, c, d, e = (p[k:k + h] for k in range(5))
        return rh(rh(rh(rh(a, e), c), c), rh(b, d))

    m = img.astype(np.int32)
    m = blur_vertical(m)
    m = blur_vertical(m.T).T
    return m.astype(np.uint8)


def _rshr(a, n=8):
    return (a >> n) + ((a >> (n - 1)) & 1)


def bilinear7_8(img: np.ndarray) -> np.ndarray:
    """Golden model reference7_8 (BilinearTest.cpp:171-196), out-of-place."""
    filt = [238, 201, 165, 128, 91, 55, 18]
    h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0
    m = img.astype(np.int64)
    out = np.zeros((h // 8 * 7, w // 8 * 7), np.int64)
    for i in range(0, h, 8):
        for j in range(0, w, 8):
            oi, oj = i // 8 * 7, j // 8 * 7
            for y in range(7):
                for x in range(7):
                    p00 = m[i + y, j + x]
                    p01 = m[i + y, j + x + 1]
                    p10 = m[i + y + 1, j + x]
                    p11 = m[i + y + 1, j + x + 1]
                    h0 = _rshr(p00 * filt[x] + p01 * filt[6 - x])
                    h1 = _rshr(p10 * filt[x] + p11 * filt[6 - x])
                    out[oi + y, oj + x] = _rshr(h0 * filt[y] + h1 * filt[6 - y])
    return out.astype(np.uint8)


def _map13(i):
    if i > 3:
        i += 1
    if i > 9:
        i += 1
    return i


def bilinear13_16(img: np.ndarray) -> np.ndarray:
    """Golden model reference13_16 (BilinearTest.cpp:208-233), out-of-place."""
    filt = [226, 167, 108, 49, 246, 187, 128, 69, 10, 207, 138, 89, 30]
    h, w = img.shape
    assert h % 16 == 0 and w % 16 == 0
    m = img.astype(np.int64)
    out = np.zeros((h // 16 * 13, w // 16 * 13), np.int64)
    for i in range(0, h, 16):
        for j in range(0, w, 16):
            oi, oj = i // 16 * 13, j // 16 * 13
            for y in range(13):
                for x in range(13):
                    p00 = m[i + _map13(y), j + _map13(x)]
                    p01 = m[i + _map13(y), j + _map13(x) + 1]
                    p10 = m[i + _map13(y) + 1, j + _map13(x)]
                    p11 = m[i + _map13(y) + 1, j + _map13(x) + 1]
                    h0 = _rshr(p00 * filt[x] + p01 * filt[12 - x])
                    h1 = _rshr(p10 * filt[x] + p11 * filt[12 - x])
                    out[oi + y, oj + x] = _rshr(h0 * filt[y] + h1 * filt[12 - y])
    return out.astype(np.uint8)


# FAST ring in the reference's circular order (Fast.h:62-128).
RING = (
    (-3, -1), (-3, 0), (-3, 1), (-2, 2),
    (-1, 3), (0, 3), (1, 3), (2, 2),
    (3, 1), (3, 0), (3, -1), (2, -2),
    (1, -3), (0, -3), (-1, -3), (-2, -2),
)


def fast_detect(img: np.ndarray, threshold: int, border: int) -> np.ndarray:
    """Literal FAST-9 per the verified semantics (SURVEY.md sec 2, comp 2):
    corner iff a circular arc of >= 9 contiguous ring pixels is uniformly
    < saturate(c - t) or uniformly > saturate(c + t)."""
    h, w = img.shape
    m = img.astype(np.int32)
    out = np.zeros((h, w), bool)
    for y in range(border, h - border):
        for x in range(border, w - border):
            c = m[y, x]
            dark_t = max(c - threshold, 0)
            light_t = min(c + threshold, 255)
            dark = [m[y + dy, x + dx] < dark_t for dy, dx in RING]
            light = [m[y + dy, x + dx] > light_t for dy, dx in RING]

            def run9(bits):
                ext = bits + bits
                run = 0
                for b in ext:
                    run = run + 1 if b else 0
                    if run >= 9:
                        return True
                return False

            out[y, x] = run9(dark) or run9(light)
    return out


def harris_score_at(img: np.ndarray, x: int, y: int, threshold: int) -> int:
    """Literal port of harrisScoreSobel semantics (Harris.h:81-248)."""
    m = img.astype(np.int64)
    patch = m[y - 3:y + 5, x - 3:x + 5]  # 8x8

    def hadd(a, b):
        return (a + b) >> 1  # arithmetic floor shift

    # dy: vertical halving deltas then horizontal smoothing (Harris.h:123-135)
    # delta[r, i] = (patch[r+2, i] - patch[r, i]) >> 1, r = 0..5
    dy = np.zeros((6, 6), np.int64)
    for r in range(6):
        delta = (patch[r + 2] - patch[r]) >> 1  # 8 lanes
        for i in range(6):
            dy[r, i] = hadd(delta[i + 1], hadd(delta[i], delta[i + 2]))
    # dx: horizontal halving deltas then vertical smoothing (Harris.h:139-162)
    hdelta = np.zeros((8, 6), np.int64)
    for r in range(8):
        for i in range(6):
            hdelta[r, i] = (patch[r, i + 2] - patch[r, i]) >> 1
    dx = np.zeros((6, 6), np.int64)
    for r in range(6):
        for i in range(6):
            dx[r, i] = hadd(hadd(hdelta[r, i], hdelta[r + 2, i]), hdelta[r + 1, i])

    sxx = int(np.sum(dx * dx))
    syy = int(np.sum(dy * dy))
    sxy = int(np.sum(dx * dy))
    ixx = (sxx >> 4) & 0xFFFFFFFF
    iyy = (syy >> 4) & 0xFFFFFFFF
    ixy = sxy >> 4  # arithmetic

    trace2 = (((ixx + iyy) * (ixx + iyy)) & 0xFFFFFFFF) >> 4
    det = (ixx * iyy - ixy * ixy) & 0xFFFFFFFF
    score = (det - trace2) & 0xFFFFFFFF
    if score >= 1 << 31:
        score -= 1 << 32  # int32
    if threshold < score:
        bits = np.float32(score).view(np.uint32)
        return int((bits >> 20) & 0xFF)
    return 0


def fast_score_harris(img, mask, threshold, border):
    """fastScoreHarris (Fast.h:166-180): mask -> uint8 quarter-float scores."""
    h, w = img.shape
    out = np.zeros((h, w), np.uint8)
    for y in range(border, h - border):
        for x in range(border, w - border):
            if mask[y, x]:
                out[y, x] = harris_score_at(img, x, y, threshold)
    return out


def encode(score, x, y):
    return (int(score) << 24) | (int(x) << 12) | int(y)


def fast_extract(out: np.ndarray, border: int, log_bucket_size: int = 0,
                 bucket_limit: int = 5, width=None, height=None):
    """Literal port of fastExtract's 2x2-scan branch logic (Fast.h:196-355).

    `out` is the scored mask (uint8), zero outside the valid region.
    Returns the list of encoded keypoints in the reference's append order.
    """
    h, w = out.shape
    if width is None:
        width = w
    if height is None:
        height = h
    m = out.astype(np.int64)
    results = []
    bucket_size = 1 << log_bucket_size
    num_buckets = (width - 2 * border - 1) // bucket_size + 1
    buckets = [[] for _ in range(num_buckets)]

    def flush():
        for b in buckets:
            results.extend(b)
            b.clear()

    for y in range(border, height - border, 2):
        if log_bucket_size != 0 and (y - border) % bucket_size == 0 and y != border:
            flush()
        for x in range(border, width - border, 2):
            v0, v1 = m[y, x], m[y, x + 1]
            v2, v3 = m[y + 1, x], m[y + 1, x + 1]
            row0 = m[y - 1, x - 1:x + 3]
            row1 = m[y, x - 1:x + 3]
            row2 = m[y + 1, x - 1:x + 3]
            row3 = m[y + 2, x - 1:x + 3]
            if not (any(row1[1:3]) or any(row2[1:3])):
                continue
            result = None
            if v0 > v1 and v0 > v2 and v0 > v3:
                if (v0 >= row0[0] and v0 >= row1[0] and v0 > row2[0]
                        and v0 >= row0[1] and v0 >= row0[2]):
                    result = encode(v0, x, y)
            elif v1 > v2 and v1 > v3:
                if (v1 >= row0[1] and v1 >= row0[2] and v1 >= row0[3]
                        and v1 > row1[3] and v1 > row2[3]):
                    result = encode(v1, x + 1, y)
            elif v2 > v3:
                if (v2 >= row1[0] and v2 >= row2[0] and v2 > row3[0]
                        and v2 > row3[1] and v2 > row3[2]):
                    result = encode(v2, x, y + 1)
            else:
                if (v3 > row3[1] and v3 > row3[2]
                        and v3 >= row1[3] and v3 > row2[3] and v3 > row3[3]):
                    result = encode(v3, x + 1, y + 1)
            if result is None:
                continue
            if log_bucket_size == 0:
                results.append(result)
            else:
                b = buckets[(x - border) // bucket_size]
                if len(b) < bucket_limit:
                    b.append(result)
                    b.sort()
                elif result > b[0]:
                    b[0] = result
                    b.sort()
    if log_bucket_size != 0:
        flush()
    return results


# Disc max |dy| per |dx| (decoded from Orb.h:117-121 strip masks).
VMAX = [15, 15, 15, 15, 15, 15, 14, 14, 13, 13, 12, 11, 10, 9, 7, 5]


def centroid(img: np.ndarray, x: int, y: int):
    """Disc moments m10, m01 (Orb.h:80-308) by direct summation."""
    m10 = 0
    m01 = 0
    for dy in range(-15, 16):
        for dx in range(-15, 16):
            if abs(dy) <= VMAX[abs(dx)]:
                v = int(img[y + dy, x + dx])
                m10 += dx * v
                m01 += dy * v
    return m10, m01


def atan2_bin(m10: int, m01: int) -> int:
    """pislam::atan2 (Orb.h:310-387) with exact division, float32 math."""
    x, y = m10, m01
    xf, yf = abs(np.float32(x)), abs(np.float32(y))
    zmax, zmin = max(xf, yf), min(xf, yf)
    if zmax == 0:
        return 0
    z = np.float32(zmin / zmax)
    c0 = np.float32(256 * 14.999998)
    c1 = np.float32(256 * 4.723436)
    c2 = np.float32(256 * 1.266240)
    anglef = z * (c0 - (z - np.float32(1)) * (c1 + c2 * z))
    angle = int(anglef)  # trunc toward zero
    if abs(x) > abs(y):
        if (x < 0) != (y < 0):
            angle = -angle
        if x < 0:
            angle += 256 * 60
        elif angle < 0:
            angle += 256 * 120
    else:
        if (x < 0) == (y < 0):
            angle = -angle
        if y >= 0:
            angle += 256 * 30
        else:
            angle += 256 * 90
    angle >>= 10
    if not (0 <= angle < 30):
        angle = 0
    return angle


def brief_describe(img: np.ndarray, x: int, y: int, rot: int, words: int = 8):
    """briefDescribe (Brief.h:28-53, 57-733) literal float32 rotation."""
    from pislam_tpu.ops._brief_pattern import BRIEF_PATTERN

    theta = np.float32(rot * np.pi / 15)
    c = np.float32(np.cos(theta))
    s = np.float32(np.sin(theta))

    def rnd(v):
        return int(np.floor(v + 0.5)) if v >= 0 else int(np.ceil(v - 0.5))

    desc = [0] * words
    for i, (dx0, dy0, dx1, dy1) in enumerate(BRIEF_PATTERN[: words * 32]):
        rdx0 = min(max(rnd(c * np.float32(dx0) - s * np.float32(dy0)), -15), 15)
        rdy0 = min(max(rnd(s * np.float32(dx0) + c * np.float32(dy0)), -15), 15)
        rdx1 = min(max(rnd(c * np.float32(dx1) - s * np.float32(dy1)), -15), 15)
        rdy1 = min(max(rnd(s * np.float32(dx1) + c * np.float32(dy1)), -15), 15)
        if img[y + rdy0, x + rdx0] < img[y + rdy1, x + rdx1]:
            desc[i // 32] |= 1 << (i % 32)
    return desc


def make_test_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish random image with structure: blurred noise + gradients
    img = rng.integers(0, 256, (h, w)).astype(np.float64)
    k = np.array([1, 4, 6, 4, 1], np.float64) / 16
    for _ in range(2):
        img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, img)
        img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img += np.linspace(0, 60, w)[None, :]
    return np.clip(img, 0, 255).astype(np.uint8)
