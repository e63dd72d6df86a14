"""Native checkpoint/resume.

The reference only saves model weights once per epoch and cannot resume
optimizer state (``train_VIGOR.py:159-163``; SURVEY.md §5.3-5.4).  Here the
full ``TrainState`` (params + BN running stats + optimizer moments + step)
round-trips through orbax, enabling every-N-steps checkpointing and
preemption recovery — the TPU-world requirement.
"""

from __future__ import annotations

import json
import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int | None = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._dir = directory
        self._mngr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: Any, wait: bool = False,
             meta: dict | None = None):
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if meta is not None:
            self.save_meta(step, meta)
        if wait:
            self._mngr.wait_until_finished()

    def save_meta(self, step: int, meta: dict):
        """(Re)write the sidecar metadata for ``step`` without touching the
        arrays — e.g. upgrading a mid-epoch save to epoch-completed."""
        # single sidecar (not per-step: max_to_keep GC would leak them);
        # only trusted on restore when its step matches latest_step
        tmp = os.path.join(self._dir, f".latest_meta.{os.getpid()}.tmp")
        with open(tmp, "w") as f:
            json.dump({"step": int(step), **meta}, f)
        os.replace(tmp, os.path.join(self._dir, "latest_meta.json"))

    def meta(self, step: int) -> dict:
        """Sidecar metadata written with the save of ``step`` (e.g. the epoch
        position); ``{}`` when absent or written for a different step."""
        path = os.path.join(self._dir, "latest_meta.json")
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            return {}
        return rec if rec.get("step") == int(step) else {}

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
