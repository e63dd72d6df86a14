"""Native checkpoint/resume.

The reference only saves model weights once per epoch and cannot resume
optimizer state (``train_VIGOR.py:159-163``; SURVEY.md §5.3-5.4).  Here the
full ``TrainState`` (params + BN running stats + optimizer moments + step)
round-trips through orbax, enabling every-N-steps checkpointing and
preemption recovery — the TPU-world requirement.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int | None = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: Any, wait: bool = False):
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mngr.wait_until_finished()

    def latest_step(self):
        return self._mngr.latest_step()

    def all_steps(self):
        """Retained checkpoint steps, ascending (bounded by max_to_keep)."""
        self._mngr.wait_until_finished()
        return sorted(self._mngr.all_steps())

    def metadata(self, step: int | None = None):
        """Structure/dtype metadata of a saved checkpoint (no array reads) —
        lets callers pick the right restore template instead of guessing."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mngr.item_metadata(step)

    def restore(self, template: Any, step: int | None = None):
        """Restore into the structure of ``template`` (e.g. a freshly created
        TrainState); returns the restored pytree."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mngr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()
