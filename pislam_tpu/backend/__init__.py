from . import ba, keyframes, pose_graph, triangulate  # noqa: F401
