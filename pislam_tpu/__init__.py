"""pislam-tpu: a TPU-native SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of 0xfaded/pislam
(ORB feature-extraction frontend), grown into a full SLAM pipeline: on-device
pyramid construction, FAST-9 + Harris + NMS + rotated-BRIEF extraction as
dense batched array programs, Hamming matching on the MXU, RANSAC visual
odometry, pose-graph optimisation and windowed sparse bundle adjustment with
Schur-complement reduction, sharded over device meshes with XLA collectives.
"""

from .config import (  # noqa: F401
    BAConfig,
    FrontendConfig,
    MapConfig,
    MatcherConfig,
    MeshConfig,
    PislamConfig,
    PyramidConfig,
    VOConfig,
)
from .frontend import Features, extract_single_level, make_extract_fn  # noqa: F401

__version__ = "0.1.0"
