from . import ba, keyframes, pnp, pose_graph, triangulate  # noqa: F401
