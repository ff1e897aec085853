from .native import FrameStream, read_png, write_png  # noqa: F401
