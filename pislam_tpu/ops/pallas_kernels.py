"""Pallas TPU kernels for the gather/select hot spots of the frontend.

Why these exist (measured on a v5e chip, demo pyramid, K=4096):

* Any per-keypoint dynamic memory access (XLA gather, vmap(dynamic_slice),
  per-keypoint DMA, dynamic VMEM vector load) costs ~1.2 us on TPU -- a
  Mosaic/XLA lowering floor, not bandwidth. 4096 keypoints => ~5 ms, the
  whole frame budget. The reference's per-feature loops (Orb.h:402-421)
  therefore cannot be translated even as per-feature *kernels*.

* The two primitives that ARE fast: XLA's row gather on >=2KB rows of
  32-bit data (~16 ns/row) and dense VPU/MXU work. So every per-keypoint
  stage is reformulated as: pack 4 image rows into one uint32 lane
  (a free sublane-packing `pltpu.bitcast` -- int8's native (32,128) vreg
  layout already interleaves 4 sublanes per 32-bit element), row-gather
  whole packed rows per keypoint, then realign to the keypoint's (x, y)
  phase with static lane rotates selected per keypoint by bit-decomposed
  offset masks (7 rounds of roll+select instead of any dynamic slice).

* Keypoint selection: jax.lax.top_k is N-linear (~1.9 ms at 1.4M).
  3x3 NMS guarantees <=1 survivor per 2x2 block (adjacent survivors are
  impossible, Fast.h:258-310 semantics), so the kernel below reduces the
  scored grid 4x exactly before top_k: vertical pair-max via the same
  bitcast row-packing, horizontal pair-max + a strided-slice lane
  compaction (in-context free; see reduce_keys_2x).

All outputs are bit-exact vs the pure-XLA fallbacks in nms.py/patches.py
(asserted by tools/tpu_parity.py on hardware and by unit tests on CPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RADIUS = 15
NR = 9          # u32 row-packs gathered per keypoint: 36 rows >= 32 + 3
BLOCK = 128     # keypoints per realign grid step


def available(img_shape) -> bool:
    """Pallas fast path is used off-CPU for lane-aligned stacked pyramids."""
    h, w = img_shape[-2], img_shape[-1]
    if jax.default_backend() == "cpu":
        return False
    return h % 8 == 0 and w % 128 == 0 and w >= 256


# ---------------------------------------------------------------------------
# row packing into overlapping strips:
# (H, W) u8 -> (NS, H/4, 256) u32, strip s covering byte-columns
# [128s, 128s + 256); u32[s, r, c] packs rows 4r..4r+3 at column 128s + c.
# The 128-column stride means any 32-wide window lives whole in some strip
# with an in-strip offset < 225, so realignment needs only 8 narrow rotate
# rounds instead of rolls across the full image width.
# ---------------------------------------------------------------------------

def num_strips(w: int) -> int:
    return w // 128 - 1


def _pack_strips_kernel(in_ref, out_ref, *, ns):
    v = pltpu.bitcast(in_ref[:], jnp.uint32)   # (H/4, W): 4 rows per lane
    for s in range(ns):
        out_ref[s] = v[:, 128 * s: 128 * s + 256]


def pack_row_strips(img):
    """Little-endian 4-row pack + overlapping 256-wide strip slicing."""
    h, w = img.shape
    assert h % 4 == 0 and w % 128 == 0 and w >= 256
    ns = num_strips(w)
    kern = functools.partial(_pack_strips_kernel, ns=ns)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, h // 4, 256), jnp.uint32),
    )(img)


# ---------------------------------------------------------------------------
# per-keypoint window realign: (K, NR, 256) strip rows -> (K, 8, 32) u32
# = the 32x32 byte window, rows packed by 4
# ---------------------------------------------------------------------------

def _realign_kernel(psi_ref, phi_ref, rows_ref, out_ref):
    v = rows_ref[:]          # (B, NR, 256) u32
    phi = phi_ref[:]         # (B, 1, 1) in-strip byte-column offset, [0, 225)
    psi = psi_ref[:]         # (B, 1, 1) row offset within the pack, [0, 4)

    # lane realign: static rotates selected by the bits of phi
    for b in (128, 64, 32, 16, 8, 4, 2, 1):
        rolled = pltpu.roll(v, 256 - b, axis=2)
        v = jnp.where((phi & b) != 0, rolled, v)
    v = v[:, :, :32]
    # row realign: shift psi bytes across the 4-row packs
    for b in (1, 2):
        vn = pltpu.roll(v, NR - 1, axis=1)
        r = 8 * b
        shifted = (v >> jnp.uint32(r)) | (vn << jnp.uint32(32 - r))
        v = jnp.where((psi & b) != 0, shifted, v)
    out_ref[:] = v[:, :8, :]


def _realign2d_kernel(psi_ref, phi_ref, rows_ref, out_ref):
    """Flat-2D variant of _realign_kernel: rows (B*NR, 256), offsets
    repeated per row. Identical math; the 2-D (multiple-of-8 sublanes,
    256 lanes) layout avoids the 3-D (B, 9, 256) form's relayouts.

    The cyclic row-roll for the psi borrow reads the NEXT keypoint's first
    row at each group's last row -- garbage that only lands in pack NR-1,
    which the output never consumes (same argument as the 3-D kernel).
    """
    v = rows_ref[:]          # (B*NR, 256) u32
    phi = phi_ref[:]         # (B*NR, 1)
    psi = psi_ref[:]         # (B*NR, 1)
    # coarse rounds on the full 256 lanes, then narrow to 128 lanes (the
    # minimum pltpu.roll width): after the b=128 and b=64 rounds the
    # residual offset is < 64, so the consumed window (cols < 32 + 63)
    # lives entirely in the first 128 lanes -- the remaining six rounds
    # run on half the data
    for b in (128, 64):
        rolled = pltpu.roll(v, 256 - b, axis=1)
        v = jnp.where((phi & b) != 0, rolled, v)
    v = v[:, :128]
    for b in (32, 16, 8, 4, 2, 1):
        rolled = pltpu.roll(v, 128 - b, axis=1)
        v = jnp.where((phi & b) != 0, rolled, v)
    v = v[:, :32]
    n = v.shape[0]
    for b in (1, 2):
        vn = pltpu.roll(v, n - 1, axis=0)      # row i <- row i+1
        r = 8 * b
        shifted = (v >> jnp.uint32(r)) | (vn << jnp.uint32(32 - r))
        v = jnp.where((psi & b) != 0, shifted, v)
    out_ref[:] = v


def realign_windows2d(rows, psi, phi):
    """rows (K, NR, 256) u32; psi (K,) in [0,4); phi (K,) in [0, 225).

    Returns (K, 8, 32) u32, bit-identical to realign_windows."""
    k, nr, w = rows.shape
    assert nr == NR and k % BLOCK == 0 and w == 256
    rep = lambda a: jnp.repeat(
        a.astype(jnp.int32), NR)[:, None]      # (K*NR, 1)
    b9 = BLOCK * NR
    out = pl.pallas_call(
        _realign2d_kernel,
        grid=(k // BLOCK,),
        in_specs=[
            pl.BlockSpec((b9, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b9, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b9, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b9, 32), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * NR, 32), jnp.uint32),
    )(rep(psi), rep(phi), rows.reshape(k * NR, 256))
    return out.reshape(k, NR, 32)[:, :8, :]


def realign_windows(rows, psi, phi):
    """rows (K, NR, 256) u32; psi (K,) in [0,4); phi (K,) in [0, 225)."""
    k, nr, w = rows.shape
    assert nr == NR and k % BLOCK == 0 and w == 256
    return pl.pallas_call(
        _realign_kernel,
        grid=(k // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, NR, 256), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, 8, 32), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, 8, 32), jnp.uint32),
    )(psi.reshape(k, 1, 1).astype(jnp.int32),
      phi.reshape(k, 1, 1).astype(jnp.int32),
      rows)


def gather_windows_packed(img, xs, ys, valid):
    """(H, W) u8 + (K,) coords -> (K, 1024) u8 packed 32x32 windows.

    Packed flat layout: byte (r, c) of the window (rows y-15..y+16,
    cols x-15..x+16) lands at index (r >> 2) * 128 + c * 4 + (r & 3).
    Invalid keypoints are redirected to a safe interior coordinate.

    Gathers NR=9 single-pack strip rows per keypoint. A 2-row "8-pack"
    variant (fewer 16 ns-floor gathered rows, 2048-lane realign rolls) was
    tried and measured ~5x SLOWER: wide-lane pltpu.roll rounds dominate
    (tools/ab_gather.py). Keep gather rows narrow.
    """
    h, w = img.shape
    k = xs.shape[0]
    pad = (-k) % BLOCK
    if pad:  # realign grid works in BLOCK-sized steps; pad and re-slice
        zi = jnp.zeros(pad, xs.dtype)
        out = gather_windows_packed(
            img, jnp.concatenate([xs, zi]), jnp.concatenate([ys, zi]),
            jnp.concatenate([valid, jnp.zeros(pad, bool)]))
        return out[:k]
    h4 = h // 4
    ns = num_strips(w)
    strips = pack_row_strips(img).reshape(ns * h4, 256)
    sx = jnp.clip(jnp.where(valid, xs, RADIUS + 1), RADIUS, w - RADIUS - 2)
    sy = jnp.clip(jnp.where(valid, ys, RADIUS + 1), RADIUS, h - RADIUS - 2)
    y0 = sy - RADIUS
    x0 = sx - RADIUS
    strip = jnp.clip(x0 >> 7, 0, ns - 1)
    phi = x0 - 128 * strip
    r0 = y0 >> 2
    psi = y0 & 3
    ridx = (strip[:, None] * h4 + r0[:, None]
            + jnp.arange(NR, dtype=jnp.int32)[None, :])
    # clamp to the strip: only ever clips rows the realign never reads
    # (valid keypoints have y <= h - 17, see tests/tools parity checks)
    ridx = jnp.minimum(ridx, (strip[:, None] + 1) * h4 - 1)
    rows = jnp.take(strips, ridx.reshape(-1), axis=0).reshape(k, NR, 256)
    p = realign_windows2d(rows, psi, phi)            # (K, 8, 32) u32
    b8 = jax.lax.bitcast_convert_type(p, jnp.uint8)  # (K, 8, 32, 4)
    return b8.reshape(k, 1024)


# ---------------------------------------------------------------------------
# fused dense frontend: FAST-9 + Harris + NMS + encode + vertical pair-merge
# in one pass over the image, 8 output rows per grid step
# ---------------------------------------------------------------------------
# XLA runs the same chain in ~0.39 ms (HBM round trips between fusion
# groups); this kernel keeps the whole 24-row working set in registers/VMEM
# and computes each stage only on the rows it needs (~0.15 ms). Semantics are
# bit-identical to fast.fast_detect + harris.harris_score + nms.nms +
# encode + the 2x2 vertical code merge (asserted by tools/tpu_parity.py and
# the interpreter tests).

FUSED_NOUT = 16   # production rows/step (A/B'd vs 8: tools/ab_fused_rows.py)

# FAST ring offsets (dy, dx), circular order -- fast.py:RING
_RING = (
    (-3, -1), (-3, 0), (-3, 1), (-2, 2),
    (-1, 3), (0, 3), (1, 3), (2, 2),
    (3, 1), (3, 0), (3, -1), (2, -2),
    (1, -3), (0, -3), (-1, -3), (-2, -2),
)


def _fused_frontend_kernel(*refs, width, fast_t, harris_t, nout):
    i = pl.program_id(0)
    w = width
    nblk = nout // 8 + 2
    m_ref = refs[nblk]
    out_ref = refs[nblk + 1]

    def lroll(v, dx):
        """v[., c] -> v[., c + dx] (circular; borders are masked)."""
        return pltpu.roll(v, (w - dx) % w, 1) if dx else v

    # local rows [0, nout+16) = image rows [nout*i-8, nout*i+nout+8);
    # score rows [7, 9+nout) (one row of NMS halo), output rows [8, 8+nout)
    x = jnp.concatenate([r[:] for r in refs[:nblk]], axis=0).astype(jnp.int32)

    # ---- FAST-9 segment test on the score rows (fast.py semantics) ----
    xc = x[7: 9 + nout]
    dark_th = xc - fast_t
    light_th = xc + fast_t
    dark = jnp.zeros_like(xc)
    light = jnp.zeros_like(xc)
    for p_, (dy, dx) in enumerate(_RING):
        s = lroll(x, dx)[7 + dy: 9 + nout + dy]
        dark = dark | ((s < dark_th).astype(jnp.int32) << p_)
        light = light | ((s > light_th).astype(jnp.int32) << p_)

    def run9(bits):
        r = bits | (bits << 16)
        r = r & (r >> 1)
        r = r & (r >> 2)
        r = r & (r >> 4)
        r = r & (r >> 1)
        return (r & 0xFFFF) != 0

    corner = run9(dark) | run9(light)

    # ---- Harris response on the score rows (harris.py exact integer
    # chain): needs dx/dy on rows [5, 11+nout), which need hd/vd on rows
    # [4, 13+nout)
    x1 = lroll(x, 1)
    xm1 = lroll(x, -1)
    hd = (x1[4: 13 + nout] - xm1[4: 13 + nout]) >> 1
    vd = (x[5: 14 + nout] - x[3: 12 + nout]) >> 1
    dxv = (((hd[: nout + 7] + hd[2: nout + 9]) >> 1) + hd[1: nout + 8]) >> 1
    vdm1 = lroll(vd, -1)
    vd1 = lroll(vd, 1)
    dyv = (((vdm1[1: nout + 8] + vd1[1: nout + 8]) >> 1)
           + vd[1: nout + 8]) >> 1

    def win6(a):
        acc = a
        for u in (-2, -1, 1, 2, 3):
            acc = acc + lroll(a, u)
        acc2 = acc[0: nout + 2]
        for v in (-1, 0, 1, 2, 3):
            acc2 = acc2 + acc[v + 2: v + 4 + nout]
        return acc2

    sxx = win6(dxv * dxv)
    syy = win6(dyv * dyv)
    sxy = win6(dxv * dyv)
    ixx = sxx >> 4
    iyy = syy >> 4
    ixy = sxy >> 4
    trace = ixx + iyy
    trace2 = pltpu.bitcast(
        pltpu.bitcast(trace * trace, jnp.uint32) >> 4, jnp.int32)
    det = ixx * iyy - ixy * ixy
    hscore = det - trace2
    fbits = pltpu.bitcast(hscore.astype(jnp.float32), jnp.uint32)
    qf = ((fbits >> 20) & jnp.uint32(0xFF)).astype(jnp.int32)
    m = m_ref[: nout + 2].astype(jnp.int32)
    score = jnp.where(corner & (hscore > harris_t) & (m > 0), qf, 0)

    # ---- 3x3 NMS, top-left tie-break, on the output rows (nms.py) ----
    s0, s1, s2 = score[0:nout], score[1: nout + 1], score[2: nout + 2]
    c = s1
    keep = ((c > 0)
            & (c >= lroll(s0, -1)) & (c >= s0) & (c >= lroll(s0, 1))
            & (c >= lroll(s1, -1))
            & (c > lroll(s1, 1)) & (c > lroll(s2, -1)) & (c > s2)
            & (c > lroll(s2, 1)))
    scored = jnp.where(keep, c, 0).astype(jnp.uint8)

    # ---- encode + vertical pair-merge (as _vmerge_kernel) ----
    nv = nout // 4
    v = pltpu.bitcast(scored, jnp.uint32)             # (nout/4, W): 4/lane
    xcol = jax.lax.broadcasted_iota(jnp.uint32, (nv, w), 1)
    ybase = (jnp.uint32(nout) * i.astype(jnp.uint32)
             + jax.lax.broadcasted_iota(jnp.uint32, (nv, w), 0) * 4)

    def enc(b, y):
        code = jnp.where(b > 0, (b << 24) | (xcol << 12) | y, jnp.uint32(0))
        return pltpu.bitcast(code ^ jnp.uint32(0x80000000), jnp.int32)

    b0 = v & jnp.uint32(0xFF)
    b1 = (v >> 8) & jnp.uint32(0xFF)
    b2 = (v >> 16) & jnp.uint32(0xFF)
    b3 = (v >> 24) & jnp.uint32(0xFF)
    out_ref[0, 0] = jnp.maximum(enc(b0, ybase), enc(b1, ybase + 1))
    out_ref[0, 1] = jnp.maximum(enc(b2, ybase + 2), enc(b3, ybase + 3))


def _mask_block_h(nout: int) -> int:
    return -(-(nout + 2) // 8) * 8    # 16 for nout=8, 24 for nout=16


def build_mask16(level_mask: np.ndarray, nout: int = 8) -> np.ndarray:
    """(H, W) bool level mask -> (ceil(H/nout)*mh, W) u8 score-halo blocks.

    Block i rows [0, nout+2) hold mask rows [nout*i-1, nout*i+nout+1)
    (zero-padded at the image edges); the rest of each mh-row block is
    alignment padding. Pure numpy: the mask is static config data, so this
    bakes into the executable as a constant (computing it with traced ops
    cost ~0.6 ms per frame).
    """
    level_mask = np.asarray(level_mask)
    h, w = level_mask.shape
    n = -(-h // nout)
    mh = _mask_block_h(nout)
    out = np.zeros((n, mh, w), np.uint8)
    mpad = np.pad(level_mask.astype(np.uint8), ((1, nout + 2), (0, 0)))
    for i in range(n):
        out[i, : nout + 2] = mpad[nout * i: nout * i + nout + 2]
    return out.reshape(n * mh, w)


def fused_frontend_keys(img, mask16, fast_t: int, harris_t: int,
                        nout: int = 8):
    """(H, W) u8 image -> (ceil(H/nout)*nout/2, W) int32 survivor keys.

    One fused pass: FAST + Harris + level mask + NMS + encode + vertical
    2x2 pair-merge, ``nout`` output rows per grid step (mask16 must be
    built with the same nout). Feed the result to select-top-k via the
    horizontal compaction (reduce_keys_2x + topk_keys). Rows beyond H
    (when H % nout != 0) carry zero keys (their mask halo is zero)."""
    h, w = img.shape
    n = -(-h // nout)
    if n * nout != h:
        img = jnp.pad(img, ((0, n * nout - h), (0, 0)))
    nblk = nout // 8 + 2
    n8 = n * nout // 8
    kern = functools.partial(_fused_frontend_kernel, width=w,
                             fast_t=fast_t, harris_t=harris_t, nout=nout)
    bs = lambda f: pl.BlockSpec((8, w), f, memory_space=pltpu.VMEM)
    r = nout // 8
    in_specs = [
        bs(functools.partial(
            lambda off, i: (jnp.clip(r * i + off, 0, n8 - 1), 0), off))
        for off in range(-1, r + 1)
    ]
    in_specs.append(pl.BlockSpec((_mask_block_h(nout), w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2, nout // 4, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, nout // 4, w), jnp.int32),
    )(*([img] * nblk), mask16)
    return out.reshape(n * nout // 2, w)


# ---------------------------------------------------------------------------
# fused BRIEF rotation-select matmul: descriptors without the (K, 30*256)
# HBM intermediate
# ---------------------------------------------------------------------------
# The XLA formulation (brief.describe_packed) computes the p1-p0 difference
# for ALL 30 rotations as one (K, 1024) x (1024, 7680) matmul and then
# selects each keypoint's rotation -- writing and re-reading a (K, 7680) i32
# intermediate (62 MB at K=2048), which costs more HBM time than the matmul
# itself. Here the rotation loop runs inside one Pallas kernel: the +-1
# difference matrix stays resident in VMEM (7.9 MB, constant block across
# grid steps), each 128-keypoint block runs 30 (128,1024)x(1024,256) i8 MXU
# dots, and the per-keypoint angle selects in-register. Only the final sign
# bits (K, 256) u8 ever reach HBM. Bit-exact vs describe_packed (interpreter
# tests + tools/tpu_parity.py).

N_BITS_TOTAL = 30 * 256
ORB_BLOCK = 256          # keypoints per grid step
ORB_GCOLS = N_BITS_TOTAL + 128   # + one MXU tile of moment columns


def _orb_select_kernel(flat_ref, g_ref, ang_ref, bits_ref):
    from .orientation import atan2_bins

    flat = flat_ref[:]                       # (B, 1024) i8
    # disc moments ride in the last weight tile (columns 0, 1 of it)
    mom = jax.lax.dot_general(
        flat, g_ref[:, N_BITS_TOTAL:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)    # (B, 128)
    ang = atan2_bins(mom[:, 0:1], mom[:, 1:2]).astype(jnp.int32)  # (B, 1)
    acc = jnp.zeros((flat.shape[0], 256), jnp.int32)
    for r in range(30):
        slab = g_ref[:, r * 256: (r + 1) * 256]
        part = jax.lax.dot_general(
            flat, slab, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = jnp.where(ang == r, part, acc)
    ang_ref[:] = ang
    bits_ref[:] = (acc > 0).astype(jnp.uint8)


def orb_select_bits(flat, gm_packed):
    """(K, 1024) i8 windows -> ((K,) i32 angle bins, (K, 256) u8 bits).

    gm_packed: (1024, ORB_GCOLS) int8 constant -- brief.GDIFF remapped to
    the packed window layout, with the two disc-moment weight columns in the
    trailing 128-column tile (brief._gm_packed). K must be a multiple of
    ORB_BLOCK (pad + reslice otherwise, as gather_windows_packed does).
    """
    k = flat.shape[0]
    pad = (-k) % ORB_BLOCK
    if pad:
        ang, bits = orb_select_bits(
            jnp.concatenate([flat, jnp.zeros((pad, flat.shape[1]), flat.dtype)]),
            gm_packed)
        return ang[:k], bits[:k]
    ang, bits = pl.pallas_call(
        _orb_select_kernel,
        grid=(k // ORB_BLOCK,),
        in_specs=[
            pl.BlockSpec((ORB_BLOCK, 1024), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1024, ORB_GCOLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ORB_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ORB_BLOCK, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, 1), jnp.int32),
            jax.ShapeDtypeStruct((k, 256), jnp.uint8),
        ],
    )(flat, gm_packed)
    return ang.reshape(k), bits


def _orb_sorted_kernel(flat_ref, ang_ref, g_ref, bits_ref, acc_ref):
    """Rotation-select for angle-SORTED keypoint blocks.

    The block's angles are contiguous after the sort, so only rotations in
    [ang[0], ang[B-1]] can be selected by any keypoint; the other dots are
    skipped behind a scalar branch (pl.when -> real Mosaic scf.if). The
    dense kernel above runs all 30 dots per block -- ~30x MXU over-work
    the reference avoided with its switch dispatch (Brief.h:641-732).
    """
    flat = flat_ref[:]                       # (B, 1024) i8
    ang = ang_ref[:]                         # (B, 1) i32, ascending
    amin = ang[0, 0]
    amax = ang[flat.shape[0] - 1, 0]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for r in range(30):
        @pl.when(jnp.logical_and(amin <= r, r <= amax))
        def _(r=r):
            part = jax.lax.dot_general(
                flat, g_ref[:, r * 256: (r + 1) * 256],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc_ref[:] = jnp.where(ang == r, part, acc_ref[:])
    bits_ref[:] = (acc_ref[:] > 0).astype(jnp.uint8)


def orb_select_bits_sorted(flat, gm_packed):
    """Angle-sorted variant of orb_select_bits (same signature/results).

    Computes the disc moments first (one narrow i8 dot against the trailing
    weight tile), sorts keypoints by angle bin, and runs the rotation-select
    kernel on the sorted order so each 256-block only executes the MXU dots
    for the few bins it actually contains (~2-4 of 30 at K=2048 after the
    sort). Costs one stable argsort + one (K, 1024) row permute + one
    (K, 256) inverse permute. A/B vs the dense kernel: tools/ab_orb_sort.py.
    """
    from .orientation import atan2_bins

    k = flat.shape[0]
    pad = (-k) % ORB_BLOCK
    if pad:
        ang, bits = orb_select_bits_sorted(
            jnp.concatenate([flat, jnp.zeros((pad, flat.shape[1]), flat.dtype)]),
            gm_packed)
        return ang[:k], bits[:k]
    mom = jax.lax.dot_general(
        flat, gm_packed[:, N_BITS_TOTAL: N_BITS_TOTAL + 2],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)            # (K, 2)
    ang = atan2_bins(mom[:, 0], mom[:, 1]).astype(jnp.int32)  # (K,)
    order = jnp.argsort(ang)                         # stable
    flat_s = jnp.take(flat, order, axis=0)
    ang_s = jnp.take(ang, order)[:, None]
    bits_s = pl.pallas_call(
        _orb_sorted_kernel,
        grid=(k // ORB_BLOCK,),
        in_specs=[
            pl.BlockSpec((ORB_BLOCK, 1024), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ORB_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1024, ORB_GCOLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ORB_BLOCK, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, 256), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((ORB_BLOCK, 256), jnp.int32)],
    )(flat_s, ang_s, gm_packed)
    inv = jnp.zeros(k, jnp.int32).at[order].set(
        jnp.arange(k, dtype=jnp.int32))
    bits = jnp.take(bits_s, inv, axis=0)
    return ang, bits


# ---------------------------------------------------------------------------
# fused Hamming match reductions: distance blocks never reach HBM
# ---------------------------------------------------------------------------
# The XLA matcher (matching.py) materialises the (K1, K2) i32 distance
# matrix (16 MB at K=2048, 128 MB at map scale K2=16384) and re-reads it for
# min / argmin / masked-second / column-argmin -- ~5 HBM round trips
# dominating the MXU matmul. This kernel computes each
# (MATCH_BLOCK, MATCH_BLOCK_K2) distance tile in VMEM via one i8 MXU dot and
# reduces it in-register. The grid is 2-D (row blocks, database blocks;
# database innermost): per-row best / first-argmin / second-best accumulate
# across database blocks in revisited output blocks, and the column
# min/first-argmin accumulates across row blocks per database block. The
# merge rule for the running second-best is exact:
#     second' = min(max(best_new, best_old), second_old, second_new)
# (case best_new < best_old: masked column moves -> old best counts;
#  case equal: the duplicate best in the other block counts as second;
#  case best_new > best_old: best_new is a second candidate.)
# Semantics identical to the XLA path (first-occurrence argmins; invalid
# slots pinned to MAX_DIST). This lifts the round-1 2048x256 database
# envelope: any lane-aligned K2 streams through VMEM (the matcher the
# reference wished for at map scale, reference README.md:125-128).

MATCH_BLOCK = 256
MATCH_BLOCK_K2 = 2048  # database columns per VMEM tile (i8: 512 KB)
MATCH_MAX = 1 << 14   # matching.MAX_DIST (sentinel > any Hamming distance)
# database rows per kernel DISPATCH: above this K2 the call is split into
# segments merged in XLA with the kernel's exact rule -- XLA's scoped-vmem
# pass pins the custom-call results in VMEM and at K2=131072 that
# allocation overflows the 16M ceiling at compile time (measured: 18.69M,
# independent of the column-state output layout)
MATCH_SEGMENT_K2 = 65536


def _match_accumulate(d, best_ref, second_ref, idx_ref, col_ref):
    """Shared tail of the match kernels: reduce one (B, BK2) distance tile
    and merge it into the running row/column accumulators (see the merge
    rule in the block comment above)."""
    i = pl.program_id(0)          # row block
    j = pl.program_id(1)          # database block (innermost)
    bk2 = d.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    best = jnp.min(d, axis=1, keepdims=True)
    first = jnp.where(d == best, cols, bk2)
    idx = jnp.min(first, axis=1, keepdims=True) + j * bk2
    masked = jnp.where(cols + j * bk2 == idx, MATCH_MAX, d)
    second = jnp.min(masked, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _row_init():
        best_ref[:] = best
        second_ref[:] = second
        idx_ref[:] = idx

    @pl.when(j > 0)
    def _row_update():
        b_old = best_ref[:]
        s_old = second_ref[:]
        i_old = idx_ref[:]
        take_new = best < b_old          # strict: keep first occurrence
        best_ref[:] = jnp.minimum(best, b_old)
        second_ref[:] = jnp.minimum(jnp.minimum(s_old, second),
                                    jnp.maximum(best, b_old))
        idx_ref[:] = jnp.where(take_new, idx, i_old)

    # per-(row block, db block) column min / first-argmin. Accumulating
    # across row blocks in a j-indexed output is illegal with j innermost
    # (non-contiguous block revisits); instead each (i, j) writes its own
    # (1, BK2) tiles and the tiny (I, K2) cross-row-block merge happens
    # in XLA after the call. Two flat 2-D outputs, NOT one (I, 2, K2)
    # 3-D output: at K2=131072 the 3-D form made Mosaic hold the whole
    # (8, 2, 131072) result in scoped VMEM (18.69M > the 16M ceiling).
    rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    cmin = jnp.min(d, axis=0, keepdims=True)             # (1, BK2)
    rfirst = jnp.where(d == cmin, rows, d.shape[0])
    carg = (jnp.min(rfirst, axis=0, keepdims=True)
            + i * d.shape[0]).astype(jnp.int32)
    col_ref[0, 0:1] = cmin
    col_ref[0, 1:2] = carg


def _match_distance_tile(a_ref, b_ref, v1_ref, v2_ref, *, nbits):
    """One (B, BK2) masked Hamming-distance tile via an i8 MXU dot."""
    dot = jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    d = (nbits - dot) >> 1
    d = jnp.where(v1_ref[:] != 0, d, MATCH_MAX)          # (B, 1) bcast
    return jnp.where(v2_ref[:] != 0, d, MATCH_MAX)       # (1, BK2) bcast


def _match_reduce_kernel(a_ref, b_ref, v1_ref, v2_ref,
                         best_ref, second_ref, idx_ref, col_ref, *, nbits):
    d = _match_distance_tile(a_ref, b_ref, v1_ref, v2_ref, nbits=nbits)
    _match_accumulate(d, best_ref, second_ref, idx_ref, col_ref)


def _match_reduce_gated_kernel(a_ref, b_ref, v1_ref, v2_ref,
                               x1_ref, y1_ref, x2_ref, y2_ref,
                               best_ref, second_ref, idx_ref, col_ref,
                               *, nbits, radius2):
    """Gated variant: pairs farther than radius on the normalised plane are
    pinned to MATCH_MAX in-register, so the production map-tracking config
    (matching.match_gated) stops materialising (K1, K2) matrices in HBM.
    Same float semantics as the XLA gate: (x1-x2)^2 + (y1-y2)^2 <= r^2."""
    d = _match_distance_tile(a_ref, b_ref, v1_ref, v2_ref, nbits=nbits)
    dx = x1_ref[:] - x2_ref[:]                           # (B, BK2) f32
    dy = y1_ref[:] - y2_ref[:]
    d = jnp.where(dx * dx + dy * dy <= radius2, d, MATCH_MAX)
    _match_accumulate(d, best_ref, second_ref, idx_ref, col_ref)


def match_reduce(a_pm1, b_pm1, valid1, valid2,
                 uv1=None, uv2=None, radius=None,
                 block=None, block_k2=None):
    """Row-wise (best, second, argmin) + column-wise first-argmin of the
    Hamming distance matrix between +-1-expanded descriptors.

    a_pm1 (K1, nbits) i8, b_pm1 (K2, nbits) i8. Returns
    (best (K1,), second (K1,), idx (K1,), col_argmin (K2,)) int32, matching
    matching.py's XLA reductions exactly. K1 is padded to the row block and
    K2 to the database block (when larger than one tile) with invalid
    slots. ``block``/``block_k2`` override the default tile sizes
    (MATCH_BLOCK / MATCH_BLOCK_K2) -- the roofline knob swept by
    tools/ab_match_blocks.py at map-scale K2.

    With uv1 (K1, 2), uv2 (K2, 2) f32 and a radius (python float), pairs
    farther apart than radius on the normalised plane are pinned to
    MATCH_MAX in-register -- the fused form of matching.match_gated's
    projection gate (bit-identical float semantics; padded slots get
    coordinate 0 but are already invalid).
    """
    k1, nbits = a_pm1.shape
    k2 = b_pm1.shape[0]
    # row-block auto-selection (tools/ab_match_blocks.py, real chip,
    # interleaved, bit-identical): 256 rows win at frame/K2<=16k scale
    # (0.171 vs 0.193 ms ungated at 16384) but 512 rows win ~8% at map
    # segment scale (1.380 vs 1.498 ms at K2=131072) -- bigger row blocks
    # amortise the database stream when the K2 loop dominates
    blk = (512 if k2 > 16384 else MATCH_BLOCK) if block is None else block
    blk2 = MATCH_BLOCK_K2 if block_k2 is None else block_k2
    gated = radius is not None
    if k2 > MATCH_SEGMENT_K2:
        # segment the database and merge with the kernel's exact rules
        # (strict-< keeps the first occurrence; second' = min(max(bA,bB),
        # sA, sB); per-segment column argmins are already complete)
        seg = MATCH_SEGMENT_K2
        best = second = idx = None
        cargs = []
        for lo in range(0, k2, seg):
            hi = min(k2, lo + seg)
            b2, s2, i2, ca = match_reduce(
                a_pm1, b_pm1[lo:hi], valid1, valid2[lo:hi],
                None if not gated else uv1,
                None if not gated else uv2[lo:hi],
                radius, block=block, block_k2=block_k2)
            i2 = i2 + lo
            cargs.append(ca)
            if best is None:
                best, second, idx = b2, s2, i2
            else:
                take_new = b2 < best
                second = jnp.minimum(jnp.minimum(second, s2),
                                     jnp.maximum(best, b2))
                idx = jnp.where(take_new, i2, idx)
                best = jnp.minimum(best, b2)
        return best, second, idx, jnp.concatenate(cargs)
    pad = (-k1) % blk
    pad2 = (-k2) % blk2 if k2 > blk2 else 0
    if pad or pad2:
        za = jnp.zeros((pad, nbits), a_pm1.dtype)
        zb = jnp.zeros((pad2, nbits), b_pm1.dtype)
        best, second, idx, carg = match_reduce(
            jnp.concatenate([a_pm1, za]),
            jnp.concatenate([b_pm1, zb]),
            jnp.concatenate([valid1, jnp.zeros(pad, bool)]),
            jnp.concatenate([valid2, jnp.zeros(pad2, bool)]),
            None if not gated else jnp.concatenate(
                [uv1, jnp.zeros((pad, 2), jnp.float32)]),
            None if not gated else jnp.concatenate(
                [uv2, jnp.zeros((pad2, 2), jnp.float32)]),
            radius, block=block, block_k2=block_k2)
        return best[:k1], second[:k1], idx[:k1], carg[:k2]
    MATCH_BLOCK_ = blk
    bk2 = min(k2, blk2)
    grid = (k1 // MATCH_BLOCK_, k2 // bk2)
    col = lambda: pl.BlockSpec((MATCH_BLOCK_, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
    row_in = lambda: pl.BlockSpec((MATCH_BLOCK_, 1), lambda i, j: (i, 0),
                                  memory_space=pltpu.VMEM)
    db_in = lambda: pl.BlockSpec((1, bk2), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((MATCH_BLOCK_, nbits), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk2, nbits), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        row_in(),
        db_in(),
    ]
    args = [a_pm1,
            b_pm1,
            valid1.reshape(k1, 1).astype(jnp.int32),
            valid2.reshape(1, k2).astype(jnp.int32)]
    if gated:
        kern = functools.partial(_match_reduce_gated_kernel, nbits=nbits,
                                 radius2=float(radius) * float(radius))
        in_specs += [row_in(), row_in(), db_in(), db_in()]
        uv1 = uv1.astype(jnp.float32)
        uv2 = uv2.astype(jnp.float32)
        args += [uv1[:, 0].reshape(k1, 1), uv1[:, 1].reshape(k1, 1),
                 uv2[:, 0].reshape(1, k2), uv2[:, 1].reshape(1, k2)]
    else:
        kern = functools.partial(_match_reduce_kernel, nbits=nbits)
    # column state rides an (I, 8, K2) output with natural (8, bk2)
    # tiles: row 0 = per-(row block, db block) column min, row 1 = its
    # first-argmin, rows 2..7 unused. The previous (I, 2, K2) form's
    # T(2, 128) tiling made XLA hold the whole result in scoped VMEM at
    # K2=131072 (18.69M > the 16M ceiling -- measured OOM at compile);
    # the 8-sublane form tiles natively and lands in HBM.
    best, second, idx, colstate = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[col(), col(), col(),
                   pl.BlockSpec((1, 8, bk2), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((k1, 1), jnp.int32),
            jax.ShapeDtypeStruct((k1, 1), jnp.int32),
            jax.ShapeDtypeStruct((k1, 1), jnp.int32),
            jax.ShapeDtypeStruct((k1 // MATCH_BLOCK_, 8, k2), jnp.int32),
        ],
    )(*args)
    # merge the per-row-block column states: global min, first-occurrence
    # argmin (carg carries the absolute row index, so min over ties IS the
    # first occurrence)
    cmin = colstate[:, 0, :]                             # (I, K2)
    carg = colstate[:, 1, :]
    gmin = jnp.min(cmin, axis=0)
    gargs = jnp.where(cmin == gmin[None, :], carg, jnp.int32(2**31 - 1))
    col_argmin = jnp.min(gargs, axis=0)
    return (best.reshape(k1), second.reshape(k1), idx.reshape(k1),
            col_argmin)


# ---------------------------------------------------------------------------
# exact top-k selection: bitonic partial sort, entirely in VMEM
# ---------------------------------------------------------------------------
# jax.lax.top_k costs ~1.3 ns/element on this chip (N-linear, k-independent).
# This kernel sorts 2048-element chunks with a bitonic network (static
# pltpu.roll compare-exchanges -- partner i^j == roll by +/-j selected by
# bit j of the index iota), then halves the chunk count per round with the
# classic bitonic top-k merge: adjacent chunks are sorted in opposite
# directions, so elementwise max IS the top-k of the pair (bitonic), cleaned
# by one log-k merge pass. Exact and fully sorted. Validated element-exact
# against jax.lax.top_k in tests (interpreter) and tools/tpu_parity.py.

MIN_KEY = -(2 ** 31)


def _cmp_step(v, j, desc):
    """Compare-exchange at XOR-distance j. v (NC, S, 128); desc bool mask."""
    if j < 128:
        up = pltpu.roll(v, j, axis=2)                 # up[i] = v[i - j]
        dn = pltpu.roll(v, v.shape[2] - j, axis=2)    # dn[i] = v[i + j]
        bit = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2) & j
    else:
        jj = j // 128
        up = pltpu.roll(v, jj, axis=1)
        dn = pltpu.roll(v, v.shape[1] - jj, axis=1)
        bit = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) & jj
    p = jnp.where(bit != 0, up, dn)          # partner value v[i ^ j]
    upper = bit == 0
    keep_max = upper == desc
    return jnp.where(keep_max, jnp.maximum(v, p), jnp.minimum(v, p))


def _chunk_parity_desc(shape):
    """True where the chunk index (dim 0) is even: descending chunks."""
    return (jax.lax.broadcasted_iota(jnp.int32, shape, 0) & 1) == 0


def _flat_index(shape):
    return (jax.lax.broadcasted_iota(jnp.int32, shape, 1) * 128
            + jax.lax.broadcasted_iota(jnp.int32, shape, 2))


def _bitonic_topk_kernel(in_ref, out_ref, *, ch):
    v = in_ref[:]                            # (NC, S, 128) i32
    base = _chunk_parity_desc(v.shape)
    i = _flat_index(v.shape)
    # full bitonic sort of each chunk, directions alternating by parity
    for log_k in range(1, ch.bit_length()):
        k = 1 << log_k
        desc = base if k == ch else ~(((i & k) == 0) ^ base)
        j = k >> 1
        while j:
            v = _cmp_step(v, j, desc)
            j >>= 1
    # merge rounds: keep the top ch of each (desc, asc) chunk pair
    while v.shape[0] > 1:
        if v.shape[0] % 2:
            v = jnp.concatenate(
                [v, jnp.full((1,) + v.shape[1:], MIN_KEY, v.dtype)], axis=0)
        nc2 = v.shape[0] // 2
        pairs = v.reshape(nc2, 2, v.shape[1], v.shape[2])
        v = jnp.maximum(pairs[:, 0], pairs[:, 1])   # bitonic top-ch per pair
        desc = _chunk_parity_desc(v.shape)
        j = ch >> 1
        while j:
            v = _cmp_step(v, j, desc)
            j >>= 1
    out_ref[:] = v[0]


def topk_keys(keys_flat, k: int):
    """Exact descending top-k of int32 keys (k a power of two >= 256)."""
    assert k & (k - 1) == 0 and k >= 256
    n = keys_flat.shape[0]
    sub = k // 128
    nrows = -(-n // 128)
    nrows = -(-nrows // sub) * sub
    padded = jnp.full((nrows * 128,), MIN_KEY, jnp.int32)
    padded = jax.lax.dynamic_update_slice(
        padded, keys_flat.astype(jnp.int32), (0,))
    v = padded.reshape(nrows // sub, sub, 128)
    kern = functools.partial(_bitonic_topk_kernel, ch=k)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sub, 128), jnp.int32),
    )(v)
    return out.reshape(k)


# ---------------------------------------------------------------------------
# exact 4x candidate reduction before top_k
# ---------------------------------------------------------------------------

def _vmerge_kernel(s_ref, out_ref, *, h4, width):
    """Scored-survivor u8 grid -> 2 planes of vertically pair-merged,
    order-mapped int32 keys (code ^ 0x80000000 viewed as int32)."""
    v = pltpu.bitcast(s_ref[:], jnp.uint32)   # (H4, W): 4 rows per lane
    x = jax.lax.broadcasted_iota(jnp.uint32, (h4, width), 1)
    y4 = jax.lax.broadcasted_iota(jnp.uint32, (h4, width), 0) * 4

    def enc(b, y):
        code = jnp.where(b > 0, (b << 24) | (x << 12) | y, jnp.uint32(0))
        return pltpu.bitcast(code ^ jnp.uint32(0x80000000), jnp.int32)

    b0 = v & jnp.uint32(0xFF)
    b1 = (v >> 8) & jnp.uint32(0xFF)
    b2 = (v >> 16) & jnp.uint32(0xFF)
    b3 = (v >> 24) & jnp.uint32(0xFF)
    out_ref[0] = jnp.maximum(enc(b0, y4), enc(b1, y4 + 1))
    out_ref[1] = jnp.maximum(enc(b2, y4 + 2), enc(b3, y4 + 3))


def reduce_keys_2x(m):
    """(R, W) i32 vertically-merged keys -> (R, W/2) u32 codes.

    Horizontal pair-max + 2x lane compaction. The compaction is a plain
    strided slice: XLA lowers it to a relayout that is in-context free,
    beating both the one-hot HIGHEST-precision f32 matmul and bf16
    u8-quarter matmuls it replaced (interleaved A/B, tools/ab_reduce.py).
    """
    hm = jnp.maximum(m, jnp.roll(m, -1, axis=1))     # even lanes valid
    keys = jax.lax.bitcast_convert_type(hm[:, ::2], jnp.uint32)
    return keys ^ jnp.uint32(0x80000000)             # back to raw codes


def reduce_codes_4x(scored):
    """(H, W) u8 scored NMS survivors -> (H/2, W/2) u32 codes.

    Exact: 3x3 NMS leaves at most one survivor per 2x2 block, so the 2x2
    max over packed codes preserves the survivor set (order is permuted,
    which top_k does not care about).
    """
    h, w = scored.shape
    assert h % 4 == 0 and w % 2 == 0
    h4 = h // 4
    kern = functools.partial(_vmerge_kernel, h4=h4, width=w)
    m = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h4, w), jnp.int32),
    )(scored).reshape(2 * h4, w)
    return reduce_keys_2x(m)
