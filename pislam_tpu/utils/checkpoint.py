"""Checkpoint / resume for SLAM state (orbax-backed).

The reference has nothing persistent (demo paints a PNG and exits,
demo.cpp:111; SURVEY.md section 5). Here the map/keyframe stores are pytrees
(backend/keyframes.py), so checkpointing is a real save/restore supporting
relocalisation and pod elasticity (BASELINE.json configs[4]).
"""

from __future__ import annotations

import os
from typing import Any


def save(path: str, state: Any):
    """Save a pytree checkpoint (overwrites)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, state, force=True)


def restore(path: str, like: Any = None) -> Any:
    """Restore a pytree checkpoint. `like` optionally provides the target
    structure/shardings (restores as plain arrays when omitted)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    if like is not None:
        return ckpt.restore(path, item=like)
    return ckpt.restore(path)
