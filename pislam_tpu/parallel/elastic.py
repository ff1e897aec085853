"""Multi-host bootstrap + elastic checkpoint/resume for pod-scale SLAM.

The reference is a single-core library with no failure story (SURVEY.md
section 5: no long-running service). At pod scale (BASELINE.json configs[4])
the TPU-native equivalents are:

* process bootstrap: jax.distributed.initialize joins this host to the
  slice's coordination service; XLA's own barrier/heartbeat layer then
  detects peer failure (a crashed host fails the collective, surfacing as a
  Python exception here rather than a hang).
* elasticity: SLAM state is a pytree (backend/keyframes.py), so recovery is
  checkpoint/restore (utils/checkpoint.py) plus re-initialisation at the new
  world size -- the CheckpointedRunner below packages the loop.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Join the JAX distributed runtime (no-op on a single-process run).

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU pods jax fills them from the
    metadata server automatically. Returns the local process index.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if coordinator and n > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=n,
            process_id=(process_id if process_id is not None
                        else int(os.environ.get("JAX_PROCESS_ID", "0"))),
        )
    return jax.process_index()


class CheckpointedRunner:
    """Periodic-checkpoint wrapper for a long-running SLAM loop.

    step_fn(state, item) -> state runs the (jitted) work; every
    `every` steps the state pytree is saved so a restarted worker -- or a
    re-shaped slice -- resumes from the last checkpoint instead of frame 0.
    """

    def __init__(self, step_fn: Callable[[Any, Any], Any], ckpt_dir: str,
                 every: int = 50):
        from ..utils import checkpoint as ckpt

        self._step = step_fn
        self._dir = ckpt_dir
        self._every = every
        self._ckpt = ckpt
        self.steps_done = 0

    def resume(self, init_state: Any) -> Any:
        """Restore the latest checkpoint if one exists, else init_state."""
        meta = os.path.join(self._dir, "STEP")
        if os.path.exists(meta):
            with open(meta) as f:
                self.steps_done = int(f.read().strip())
            return self._ckpt.restore(
                os.path.join(self._dir, "state"), like=init_state)
        return init_state

    def run(self, state: Any, items) -> Any:
        for i, item in enumerate(items):
            if i < self.steps_done:
                continue  # already covered by the restored checkpoint
            state = self._step(state, item)
            self.steps_done = i + 1
            if self.steps_done % self._every == 0:
                self._save(state)
        self._save(state)
        return state

    def _save(self, state):
        if jax.process_index() != 0:
            return
        os.makedirs(self._dir, exist_ok=True)
        self._ckpt.save(os.path.join(self._dir, "state"), state)
        tmp = os.path.join(self._dir, "STEP.tmp")
        with open(tmp, "w") as f:
            f.write(str(self.steps_done))
        os.replace(tmp, os.path.join(self._dir, "STEP"))
