from . import camera, epipolar, homography, ransac, se3  # noqa: F401
