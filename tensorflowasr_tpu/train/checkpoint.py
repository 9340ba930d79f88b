"""Orbax checkpointing of the full train state.

Upgrades the reference's .h5-per-component save without optimizer/RNG state
(ctc_runners.py:272-325 in Z-yq/TensorflowASR) to atomic full-state
checkpoints (params + batch_stats + opt state + step) with max_to_keep
pruning and latest-step resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 10):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, abstract_state: Any) -> Optional[Any]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract_state))

    def close(self):
        self._mgr.close()
