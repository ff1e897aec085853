"""Pallas TPU kernels checked on CPU via the Mosaic interpreter.

These exercise the actual kernel code (pallas_kernels.py) that the TPU fast
path runs -- bitcast row packing, strip slicing, rotate-based realignment,
and the exact 4x candidate reduction -- against the plain fallbacks, without
needing hardware. tools/tpu_parity.py repeats the same assertions compiled
on a real chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from pislam_tpu.ops import nms, pallas_kernels as pk
from pislam_tpu.utils import codec


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w), np.uint8)


def test_gather_windows_packed_interpret():
    _check_gather(64, 384, 96)   # k deliberately not a multiple of BLOCK


def test_gather_windows_many_strips_interpret():
    _check_gather(48, 768, 64)   # 5 strips (wide KITTI-like images)


def _check_gather(h, w, k):
    rng = np.random.default_rng(1)
    img = _img(h, w, 1)
    xs = rng.integers(16, w - 16, k).astype(np.int32)
    ys = rng.integers(16, h - 16, k).astype(np.int32)
    valid = rng.random(k) < 0.9
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(pk.gather_windows_packed(
            jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(valid)))
    r = np.arange(31)[:, None]
    c = np.arange(31)[None, :]
    packed_idx = ((r >> 2) * 128 + c * 4 + (r & 3)).reshape(-1)
    for i in np.flatnonzero(valid):
        win = img[ys[i] - 15: ys[i] + 17, xs[i] - 15: xs[i] + 17]
        assert np.array_equal(out[i][packed_idx].reshape(31, 31), win[:31, :31])


def test_gather_windows_bottom_edge_rows():
    """Keypoints at the maximum legal y (h - 17) exercise the strip-row clamp."""
    h, w = 64, 384
    img = _img(h, w, 2)
    ys = np.array([h - 17, h - 18, h - 19, h - 20], np.int32)
    xs = np.array([40, 150, 260, 350], np.int32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(pk.gather_windows_packed(
            jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys),
            jnp.ones(4, bool)))
    r = np.arange(31)[:, None]
    c = np.arange(31)[None, :]
    packed_idx = ((r >> 2) * 128 + c * 4 + (r & 3)).reshape(-1)
    for i in range(4):
        win = img[ys[i] - 15: ys[i] + 17, xs[i] - 15: xs[i] + 17]
        assert np.array_equal(out[i][packed_idx].reshape(31, 31), win[:31, :31])


def test_reduce_codes_4x_interpret():
    h, w = 64, 256
    rng = np.random.default_rng(3)
    # random sparse survivor grid with the NMS <=1-per-2x2 property
    scored = np.zeros((h, w), np.uint8)
    cy = rng.integers(1, h // 2 - 1, 120) * 2
    cx = rng.integers(1, w // 2 - 1, 120) * 2
    scored[cy, cx] = rng.integers(1, 256, 120).astype(np.uint8)
    with pltpu.force_tpu_interpret_mode():
        red = np.asarray(pk.reduce_codes_4x(jnp.asarray(scored)))
    enc = np.asarray(nms.encode_grid(jnp.asarray(scored),
                                     jnp.asarray(scored > 0)))
    assert red.shape == (h // 2, w // 2)
    got = np.sort(red[red != 0])
    expect = np.sort(enc[enc != 0])
    assert np.array_equal(got, expect)
    # decoded coordinates must round-trip
    for code in got[:16]:
        x = int(codec.decode_x(jnp.uint32(code)))
        y = int(codec.decode_y(jnp.uint32(code)))
        s = int(codec.decode_score(jnp.uint32(code)))
        assert scored[y, x] == s


def test_bitonic_topk_interpret():
    rng = np.random.default_rng(5)
    for n, k in ((50_000, 512), (4096, 256), (300, 256)):
        keys = np.full(n, pk.MIN_KEY, np.int32)
        nz = rng.choice(n, min(n // 2, 1500), replace=False)
        keys[nz] = rng.integers(-2**31 + 1, 2**31 - 1, len(nz)).astype(np.int32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(pk.topk_keys(jnp.asarray(keys), k))
        expect = np.sort(keys)[::-1][:k]
        assert np.array_equal(got, expect), (n, k)


def test_fused_frontend_keys_interpret():
    """Fused FAST+Harris+NMS+merge kernel vs the XLA ops, survivor-set exact."""
    _check_fused_keys(64, 256, nout=8)


def test_fused_frontend_keys_16row_interpret():
    _check_fused_keys(64, 256, nout=16)


def test_fused_frontend_keys_16row_ragged_interpret():
    _check_fused_keys(72, 256, nout=16)   # h % nout != 0: padded tail rows


def _check_fused_keys(h, w, nout):
    from pislam_tpu.ops import fast, harris

    img = _img(h, w, 7)
    mask = np.zeros((h, w), bool)
    mask[16:h - 16, 16:w - 16] = True
    ji = jnp.asarray(img)
    corner = fast.fast_detect(ji, 20)
    score = harris.harris_score(ji, 1 << 10, mask=corner)
    score = jnp.where(jnp.asarray(mask), score, jnp.uint8(0))
    scored = np.asarray(jnp.where(nms.nms(score), score, jnp.uint8(0)))
    enc = np.asarray(nms.encode_grid(jnp.asarray(scored),
                                     jnp.asarray(scored > 0)))
    with pltpu.force_tpu_interpret_mode():
        keys = np.asarray(pk.fused_frontend_keys(
            ji, jnp.asarray(pk.build_mask16(mask, nout)), 20, 1 << 10, nout))
    codes = (keys.astype(np.int64) & 0xFFFFFFFF) ^ 0x80000000
    got = np.sort(codes[codes != 0])
    expect = np.sort(enc[enc != 0].astype(np.int64))
    assert np.array_equal(got, expect)


def test_orb_select_bits_interpret():
    """Fused moments+atan2+rotation-select kernel == the dense formulation."""
    from pislam_tpu.ops import brief

    rng = np.random.default_rng(7)
    k = 300  # deliberately not a multiple of ORB_BLOCK
    flat = rng.integers(-128, 128, (k, 1024)).astype(np.int8)
    with pltpu.force_tpu_interpret_mode():
        ang, bits = pk.orb_select_bits(
            jnp.asarray(flat), jnp.asarray(brief._gm_packed()))
    words = np.asarray(brief._pack_bits_u8(bits, 8))
    eang, edesc = brief._orb_compute_packed_dense(jnp.asarray(flat), 8)
    assert np.array_equal(np.asarray(ang), np.asarray(eang).astype(np.int32))
    assert np.array_equal(words, np.asarray(edesc))


def test_orb_select_bits_sorted_interpret():
    """Angle-sorted rotation-skip kernel == the dense formulation."""
    from pislam_tpu.ops import brief

    rng = np.random.default_rng(17)
    k = 300  # deliberately not a multiple of ORB_BLOCK
    flat = rng.integers(-128, 128, (k, 1024)).astype(np.int8)
    with pltpu.force_tpu_interpret_mode():
        ang, bits = pk.orb_select_bits_sorted(
            jnp.asarray(flat), jnp.asarray(brief._gm_packed()))
    words = np.asarray(brief._pack_bits_u8(bits, 8))
    eang, edesc = brief._orb_compute_packed_dense(jnp.asarray(flat), 8)
    assert np.array_equal(np.asarray(ang), np.asarray(eang).astype(np.int32))
    assert np.array_equal(words, np.asarray(edesc))


def test_match_reduce_interpret():
    """Fused match reductions == the XLA distance-matrix reductions."""
    from pislam_tpu import matching

    rng = np.random.default_rng(11)
    k1, k2 = 320, 256  # k1 not a multiple of MATCH_BLOCK
    d1 = rng.integers(0, 2**32, (k1, 8), dtype=np.uint32)
    d2 = rng.integers(0, 2**32, (k2, 8), dtype=np.uint32)
    # force some exact duplicates so argmin tie-breaks are exercised
    d2[100] = d1[7]
    d2[101] = d1[7]
    d1[200] = d1[7]
    v1 = rng.random(k1) < 0.9
    v2 = rng.random(k2) < 0.9
    a = matching.expand_pm1(jnp.asarray(d1))
    b = matching.expand_pm1(jnp.asarray(d2))
    with pltpu.force_tpu_interpret_mode():
        best, second, idx, carg = pk.match_reduce(
            a, b, jnp.asarray(v1), jnp.asarray(v2))
    dist = matching.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2),
                                   jnp.asarray(v1), jnp.asarray(v2))
    eidx, ebest, esecond = matching._best_two(dist)
    ecarg = jnp.argmin(dist, axis=0)
    assert np.array_equal(np.asarray(best), np.asarray(ebest))
    assert np.array_equal(np.asarray(second), np.asarray(esecond))
    assert np.array_equal(np.asarray(idx), np.asarray(eidx))
    assert np.array_equal(np.asarray(carg), np.asarray(ecarg))


def test_match_reduce_gated_interpret():
    """Fused projection gate == matching.match_gated's XLA dense-matrix
    gate, bit-exactly (incl. behind-camera inf coordinates and pairs
    exactly on the radius)."""
    from pislam_tpu import matching

    rng = np.random.default_rng(21)
    k1, k2 = 320, 256
    d1 = rng.integers(0, 2**32, (k1, 8), dtype=np.uint32)
    d2 = rng.integers(0, 2**32, (k2, 8), dtype=np.uint32)
    d2[50] = d1[7]      # perfect match ...
    v1 = rng.random(k1) < 0.9
    v2 = rng.random(k2) < 0.9
    uv1 = rng.uniform(-0.5, 0.5, (k1, 2)).astype(np.float32)
    uv2 = rng.uniform(-0.5, 0.5, (k2, 2)).astype(np.float32)
    uv2[50] = uv1[7] + [0.2, 0.0]   # ... pushed outside the gate
    uv2[40] = 1e6                   # behind-camera sentinel
    uv2[41] = np.inf
    uv1[100] = uv2[100] + [0.06, 0.0]  # exactly ON the radius (<= keeps it)
    radius = 0.06
    a = matching.expand_pm1(jnp.asarray(d1))
    b = matching.expand_pm1(jnp.asarray(d2))
    with pltpu.force_tpu_interpret_mode():
        best, second, idx, carg = pk.match_reduce(
            a, b, jnp.asarray(v1), jnp.asarray(v2),
            jnp.asarray(uv1), jnp.asarray(uv2), radius)
    dist = matching.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2),
                                   jnp.asarray(v1), jnp.asarray(v2))
    d2m = jnp.sum((jnp.asarray(uv1)[:, None, :]
                   - jnp.asarray(uv2)[None, :, :]) ** 2, axis=-1)
    dist = jnp.where(d2m <= radius * radius, dist, matching.MAX_DIST)
    eidx, ebest, esecond = matching._best_two(dist)
    ecarg = jnp.argmin(dist, axis=0)
    assert np.array_equal(np.asarray(best), np.asarray(ebest))
    assert np.array_equal(np.asarray(second), np.asarray(esecond))
    assert np.array_equal(np.asarray(idx), np.asarray(eidx))
    assert np.array_equal(np.asarray(carg), np.asarray(ecarg))


def test_match_gated_kernel_vs_xla_path():
    """matching.match_gated's two branches (Pallas kernel vs XLA dense)
    agree on final (idx, dist) through ratio + cross-check, via the
    interpreter on the kernel branch."""
    from pislam_tpu import matching

    rng = np.random.default_rng(22)
    k1, k2 = 256, 512
    d1 = rng.integers(0, 2**32, (k1, 8), dtype=np.uint32)
    base = rng.integers(0, 2**32, (k2, 8), dtype=np.uint32)
    # correlated database: flip a few bits of query rows so ratio tests bite
    for i in range(0, k1, 3):
        base[(i * 7) % k2] = d1[i] ^ np.uint32(rng.integers(0, 2**10))
    v1 = rng.random(k1) < 0.95
    v2 = rng.random(k2) < 0.95
    uv1 = rng.uniform(-0.5, 0.5, (k1, 2)).astype(np.float32)
    uv2 = rng.uniform(-0.5, 0.5, (k2, 2)).astype(np.float32)
    radius = 0.25
    args = (jnp.asarray(d1), jnp.asarray(base), jnp.asarray(v1),
            jnp.asarray(v2), jnp.asarray(uv1), jnp.asarray(uv2))

    a = matching.expand_pm1(jnp.asarray(d1))
    b = matching.expand_pm1(jnp.asarray(base))
    with pltpu.force_tpu_interpret_mode():
        best, second, idx2, carg = pk.match_reduce(
            a, b, jnp.asarray(v1), jnp.asarray(v2),
            jnp.asarray(uv1), jnp.asarray(uv2), radius)
    ok = best <= 64
    ok &= best.astype(jnp.float32) < 0.8 * second.astype(jnp.float32)
    ok &= carg[idx2] == jnp.arange(k1)
    ok &= jnp.asarray(v1)
    k_idx = np.asarray(jnp.where(ok, idx2, -1))
    k_dist = np.asarray(jnp.where(ok, best, matching.MAX_DIST))

    e_idx, e_dist = matching.match_gated(*args, radius, max_distance=64,
                                         ratio=0.8, cross_check=True)
    assert np.array_equal(k_idx, np.asarray(e_idx))
    assert np.array_equal(k_dist, np.asarray(e_dist))


def test_realign2d_matches_realign():
    rng = np.random.default_rng(13)
    k = 256
    rows = rng.integers(0, 2**32, (k, pk.NR, 256), dtype=np.uint32)
    psi = rng.integers(0, 4, k).astype(np.int32)
    phi = rng.integers(0, 225, k).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(pk.realign_windows(
            jnp.asarray(rows), jnp.asarray(psi), jnp.asarray(phi)))
        b = np.asarray(pk.realign_windows2d(
            jnp.asarray(rows), jnp.asarray(psi), jnp.asarray(phi)))
    assert np.array_equal(a, b)


def test_match_reduce_tiled_interpret():
    """K2-tiled path (database > one VMEM tile): the running
    best/second/argmin merge across database blocks must equal the XLA
    whole-matrix reductions, including ties split across blocks."""
    from pislam_tpu import matching

    rng = np.random.default_rng(13)
    bk2 = pk.MATCH_BLOCK_K2
    k1, k2 = 320, bk2 * 2 + 384  # multi-tile + K2 padding path
    d1 = rng.integers(0, 2**32, (k1, 8), dtype=np.uint32)
    d2 = rng.integers(0, 2**32, (k2, 8), dtype=np.uint32)
    # exact duplicates split ACROSS database tiles: best in tile 0 with its
    # duplicate in tile 1 (second must equal best), best in tile 2 beating
    # tile 0 (argmin must move), and a within-tile duplicate
    d2[10] = d1[3]
    d2[bk2 + 7] = d1[3]
    d2[2 * bk2 + 100] = d1[5]
    d2[40] = d1[5] ^ np.uint32(3)       # 2 bits worse, earlier tile
    d2[500] = d1[9]
    d2[501] = d1[9]
    v1 = rng.random(k1) < 0.9
    v2 = rng.random(k2) < 0.9
    v1[[3, 5, 9]] = True
    v2[[10, bk2 + 7, 2 * bk2 + 100, 40, 500, 501]] = True
    a = matching.expand_pm1(jnp.asarray(d1))
    b = matching.expand_pm1(jnp.asarray(d2))
    with pltpu.force_tpu_interpret_mode():
        best, second, idx, carg = pk.match_reduce(
            a, b, jnp.asarray(v1), jnp.asarray(v2))
    dist = matching.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2),
                                   jnp.asarray(v1), jnp.asarray(v2))
    eidx, ebest, esecond = matching._best_two(dist)
    ecarg = jnp.argmin(dist, axis=0)
    assert np.array_equal(np.asarray(best), np.asarray(ebest))
    assert np.array_equal(np.asarray(second), np.asarray(esecond))
    assert np.array_equal(np.asarray(idx), np.asarray(eidx))
    assert np.array_equal(np.asarray(carg), np.asarray(ecarg))
