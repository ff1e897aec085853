"""Checkpoint / resume for SLAM state (orbax-backed).

The reference has nothing persistent (demo paints a PNG and exits,
demo.cpp:111; SURVEY.md section 5). Here the map/keyframe stores are pytrees
(backend/keyframes.py), so checkpointing is a real save/restore supporting
relocalisation and pod elasticity (BASELINE.json configs[4]).
"""

from __future__ import annotations

import os
from typing import Any


def _checkpointer():
    """Process-LOCAL orbax checkpointer.

    Orbax's default Checkpointer barriers across ALL processes inside both
    save() ('Checkpointer:save_start'/'Checkpointer:save') and restore()
    ('Checkpointer:restore'), so the primary-only save in
    parallel/elastic.CheckpointedRunner._save would deadlock a multi-process
    run (process 0 waits in the barrier; the others never call it). SLAM
    checkpoints here are host-local state (the runner broadcasts the step
    counter on resume precisely because filesystems may not be shared), so
    the correct scope is per-process IO: each process barriers only with
    itself. Verified by the two-process test (tests/test_multiprocess.py).
    """
    import jax
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        idx = jax.process_index()
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=idx, active_processes={idx},
                barrier_sync_key_prefix=f"pislam_proc{idx}"))
    return ocp.PyTreeCheckpointer()


def save(path: str, state: Any):
    """Save a pytree checkpoint (overwrites)."""
    import jax

    path = os.path.abspath(path)
    if jax.process_count() > 1:
        # orbax's array serializer refuses host-local jax.Arrays whenever
        # process_count() > 1 ("Cannot serialize host local jax.Array in
        # multi-host setting", jax_array_handlers.serialize) -- and SLAM
        # state is host-local by design (per-process maps, counter broadcast
        # on resume). Host numpy serializes without the multihost machinery.
        state = jax.device_get(state)
    _checkpointer().save(path, state, force=True)


def restore(path: str, like: Any = None) -> Any:
    """Restore a pytree checkpoint. `like` optionally provides the target
    structure/shardings (restores as plain arrays when omitted)."""
    import jax

    path = os.path.abspath(path)
    ckpt = _checkpointer()
    if like is not None:
        if jax.process_count() > 1:
            like = jax.device_get(like)  # see save(): restore as host numpy
        return ckpt.restore(path, item=like)
    return ckpt.restore(path)
