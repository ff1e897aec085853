from . import slam, visual_odometry  # noqa: F401
