"""vrecpe-faithful atan2 probe: quantify the one documented semantic
deviation from the reference orientation path.

The reference computes z = zmin * vrecpeq_f32(zmax) -- a single NEON
8-bit-mantissa reciprocal ESTIMATE, no Newton refinement (Orb.h:329-331)
-- before the polynomial; the production path (ops/orientation.py
atan2_bins) divides exactly. This tool emulates `vrecpeq_f32` bit-exactly
per the ARM ARM FPRecipEstimate pseudocode (scaled 9-bit lookup:
a = 2*scaled+1, b = 2^19 div a, r = (b+1) div 2; result exponent
253 - exp; estimate<7:0> as the result mantissa), runs BOTH chains over
the intensity-centroid moments of every keypoint the production frontend
extracts from the reference demo pyramid, and reports the bin
disagreement count -- the number to hold against the reference's own
1/273 misclassification envelope for the polynomial itself
(Orb.h:344-345).

Result (committed to README): the exact divide and the vrecpe estimate
land in the same 12-degree bin for virtually all real keypoints; the
estimate's relative error is <= 2^-8 while a bin spans 256 internal
units, so only moments within ~1 unit of a bin boundary can flip.

Usage: python tools/vrecpe_probe.py  (CPU-safe, one extraction dispatch)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEMO_PNG = "/root/reference/demo/input.png"


def vrecpe_f32(x: np.ndarray) -> np.ndarray:
    """Bit-exact NEON VRECPE.F32 estimate (ARM ARM FPRecipEstimate).

    Covers positive normal inputs with 0 < result_exp < 255 -- the only
    cases centroid moments produce (|m| in [1, ~3.7e6]); zero maps to
    +inf like the hardware (the reference's NaN guard then fires).
    """
    x = np.asarray(x, np.float32)
    bits = x.view(np.uint32)
    exp = (bits >> 23) & 0xFF
    frac = bits & 0x7FFFFF
    scaled = (1 << 8) | (frac >> 15)          # 9 bits: [256, 511]
    a = scaled * 2 + 1                        # [513, 1023]
    b = (1 << 19) // a
    r = (b + 1) >> 1                          # [256, 511]
    result_exp = (253 - exp).astype(np.int64)
    out = ((result_exp.astype(np.uint32) & 0xFF) << 23) \
        | ((r & 0xFF).astype(np.uint32) << 15)
    out = out.astype(np.uint32).view(np.float32)
    out = np.where(x == 0.0, np.float32(np.inf), out)
    assert np.all((result_exp > 0) | (x == 0)), "input out of probe range"
    return out


def atan2_bins_vrecpe(m10: np.ndarray, m01: np.ndarray) -> np.ndarray:
    """The reference atan2 chain (Orb.h:310-387) with the ESTIMATE."""
    x = m10.astype(np.int64)
    y = m01.astype(np.int64)
    xf = np.abs(x.astype(np.float32))
    yf = np.abs(y.astype(np.float32))
    zmax = np.maximum(xf, yf)
    zmin = np.minimum(xf, yf)
    with np.errstate(invalid="ignore"):
        z = (zmin * vrecpe_f32(zmax)).astype(np.float32)
    c0 = np.float32(256 * 14.999998)
    c1 = np.float32(256 * 4.723436)
    c2 = np.float32(256 * 1.266240)
    anglef = z * (c0 - (z - np.float32(1.0)) * (c1 + c2 * z))
    # vcvtq_s32_f32 truncates toward zero; NaN converts to 0 on NEON
    angle = np.where(np.isnan(anglef), 0,
                     np.trunc(anglef)).astype(np.int64)

    signs_differ = (x < 0) ^ (y < 0)
    xdom = np.abs(x) > np.abs(y)
    a1 = np.where(signs_differ, -angle, angle)
    a1 = np.where(x < 0, a1 + 256 * 60, np.where(a1 < 0, a1 + 256 * 120, a1))
    a2 = np.where(~signs_differ, -angle, angle)
    a2 = np.where(y >= 0, a2 + 256 * 30, a2 + 256 * 90)
    out = np.where(xdom, a1, a2) >> 10
    return np.where((out >= 0) & (out < 30), out, 0).astype(np.uint8)


def main():
    from PIL import Image
    import jax.numpy as jnp

    import pislam_tpu
    from pislam_tpu.ops import orientation
    from pislam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    img = np.asarray(Image.open(DEMO_PNG).convert("L"))
    cfg = pislam_tpu.PislamConfig()
    pc = cfg.pyramid
    stack = np.zeros((pc.padded_height, pc.stride), np.uint8)
    stack[: img.shape[0], : img.shape[1]] = img
    feats = pislam_tpu.make_extract_fn(cfg)(stack)

    valid = np.asarray(feats.valid)
    xs = np.asarray(feats.xs)[valid]
    ys = np.asarray(feats.ys)[valid]

    # 31x31 patches around every keypoint (border >= 16 keeps them in-bounds)
    patches = np.stack([stack[y - 15:y + 16, x - 15:x + 16]
                        for x, y in zip(xs, ys)])
    m10, m01 = orientation.centroids(jnp.asarray(patches))
    m10 = np.asarray(m10)
    m01 = np.asarray(m01)

    bins_exact = np.asarray(orientation.atan2_bins(
        jnp.asarray(m10), jnp.asarray(m01)))
    bins_est = atan2_bins_vrecpe(m10, m01)

    n = int(valid.sum())
    diff = bins_exact.astype(int) - bins_est.astype(int)
    mism = int(np.sum(diff != 0))
    # all disagreements must be +-1 bin (adjacent boundary flips)
    adjacent = int(np.sum(np.minimum(np.abs(diff), 30 - np.abs(diff)) <= 1))
    print(json.dumps({
        "metric": "vrecpe_atan2_bin_disagreement",
        "keypoints": n,
        "disagreements": mism,
        "rate": round(mism / max(n, 1), 5),
        "all_adjacent_bin": bool(adjacent == n),
        "reference_polynomial_envelope": "1/273 (Orb.h:344-345)",
    }))


if __name__ == "__main__":
    main()
