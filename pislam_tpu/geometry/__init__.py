from . import camera, epipolar, ransac, se3  # noqa: F401
