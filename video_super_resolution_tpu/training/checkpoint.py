"""Orbax checkpointing (SURVEY.md §5.4): async, sharding-aware save/restore
of the full TrainState + config JSON, with retention.

The reference family does ``torch.save({epoch, model, optimizer})`` per epoch;
here checkpoints are written asynchronously (training does not stall on IO)
and restore is sharding-aware: params land directly on the mesh with their
target shardings (crash recovery story in SURVEY.md §5.3: frequent async
checkpoints + relaunch-on-failure + restore-latest).

Compatibility note: restore uses ocp.args.StandardRestore(state_template),
which is structure-strict — the param-tree key rename fusion/Conv_0 ->
fusion/Score1_0 (2026-08-20, the Score1 contraction rewrite) invalidates
checkpoints saved before it. No shim is kept: no pre-rename checkpoint needs
to remain loadable (none was ever a trained artifact), and torch weight
import is unaffected (the sorted-path slot of the score conv is unchanged).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from video_super_resolution_tpu.config import VSRConfig


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, enable_async_checkpointing=async_save
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, config: Optional[VSRConfig] = None):
        args = {"state": ocp.args.StandardSave(state)}
        if config is not None:
            args["config"] = ocp.args.JsonSave(config.to_json())
        self._mgr.save(step, args=ocp.args.Composite(**args))

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore latest (or given) step into the template's pytree/shardings."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(state_template)),
        )
        return restored["state"], step

    def restore_config(self, step: Optional[int] = None) -> Optional[VSRConfig]:
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.Composite(config=ocp.args.JsonRestore())
            )
            return VSRConfig.from_json(restored["config"])
        except Exception:
            return None

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
