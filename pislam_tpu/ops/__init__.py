from . import bilinear, brief, fast, gaussian, harris, nms, orientation, patches  # noqa: F401
