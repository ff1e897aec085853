"""VO frame decomposition + RANSAC hypothesis-solver A/B on hardware.

Found: at 384x256/512kp the 256-hypothesis RANSAC stage measured ~6.5 of
the ~6.6 ms VO frame -- the per-hypothesis LAPACK-style SVD loops
(jnp.linalg.svd of (8, 9) plus (3, 3) per hypothesis) do not vectorise on
TPU. essential_8pt_fast replaces the hypothesis solve with 8 batched
Householder reflections (exact nullvector, pure VPU); the winner refit
keeps the SVD path (once per frame).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import interleaved_ab, xru32

from pislam_tpu.config import (FrontendConfig, MatcherConfig, PislamConfig,
                               PyramidConfig, VOConfig)
from pislam_tpu.frontend import _extract_impl
from pislam_tpu.ops import nms, pyramid as pyr_ops
from pislam_tpu import matching
from pislam_tpu.geometry import epipolar, ransac


def main():
    cfg = PislamConfig(
        pyramid=PyramidConfig(base_width=384, base_height=256, num_levels=4),
        frontend=FrontendConfig(fast_threshold=20, harris_threshold=1 << 10,
                                border=16, max_keypoints=512),
        matcher=MatcherConfig(max_distance=64, ratio=0.85),
        vo=VOConfig(ransac_iters=256, inlier_threshold=2e-3, min_inliers=20))
    pc = cfg.pyramid
    mask = jnp.asarray(nms.make_level_mask(
        pc.level_sizes, pc.level_rows, pc.padded_height, pc.stride,
        cfg.frontend.border))
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (256, 384), np.uint8))

    def extract_of(img):
        return _extract_impl(pyr_ops.build_pyramid(img, pc), mask, cfg)

    f0 = jax.jit(extract_of)(frame)
    pts0 = jnp.asarray(rng.uniform(-0.5, 0.5, (512, 2)).astype(np.float32))

    def ransac_svd(key, p1, p2, ok):
        """The replaced hypothesis path, inlined for the A/B."""
        idx = jax.random.categorical(
            key, jnp.where(ok, 0.0, -jnp.inf)[None, :], shape=(256, 8))
        es = jax.vmap(epipolar.essential_8pt)(p1[idx], p2[idx])
        err = jax.vmap(lambda e: epipolar.sampson_error(e, p1, p2))(es)
        inl = (err < 2e-3) & ok[None, :]
        return es[jnp.argmax(jnp.sum(inl, 1))]

    def stage(op):
        def v(img):
            f = extract_of(img)
            idx2, _ = matching.match(f0.descriptors, f.descriptors,
                                     f0.valid, f.valid,
                                     max_distance=64, ratio=0.85)
            ok = idx2 >= 0
            p2 = pts0[jnp.clip(idx2, 0)]
            out = op(jax.random.PRNGKey(0), pts0, p2, ok)
            r00 = out["R"][0, 0] if isinstance(out, dict) else out[0, 0]
            return xru32(f.codes) ^ jnp.float32(r00).view(jnp.uint32)
        return v

    def full_fast(key, p1, p2, ok):
        return ransac.ransac_essential(key, p1, p2, ok, iters=256,
                                       inlier_threshold=2e-3)

    interleaved_ab({
        "hyp_svd_loop": stage(ransac_svd),
        "full_fast_ransac": stage(full_fast),
    }, frame, n_lo=2, n_hi=12, label_w=18)


if __name__ == "__main__":
    main()
