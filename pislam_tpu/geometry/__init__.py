from . import epipolar, ransac, se3  # noqa: F401
