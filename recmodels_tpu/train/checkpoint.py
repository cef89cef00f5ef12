"""Checkpoint / resume via orbax (SURVEY.md §5.3-5.4).

Replaces the reference's ``Optimizer.setCheckpoint`` + ``Module.saveModule``
(BigDL snapshots to disk every N iterations): an orbax ``CheckpointManager``
snapshots ``{train_state, data_source_state}`` — params, BOTH optimizer
states (dense + sparse rows), step counter, and the data cursor — so a
preempted run resumes bit-identically (test_checkpoint.py asserts this).
Sharded arrays are written shard-per-host by orbax and can be restored under
a different mesh (orbax resharding).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

from recmodels_tpu.train.engine import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, save_interval_steps: int = 1):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: TrainState, data_state: dict | None = None,
             force: bool = False) -> bool:
        """``force=True`` bypasses save_interval_steps (use for the final
        save — otherwise orbax silently skips it and a restore resumes from
        a much older step)."""
        return self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                data=ocp.args.JsonSave(data_state or {}),
            ),
            force=force,
        )

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, abstract_state: TrainState, step: int | None = None):
        """Restore (state, data_state). ``abstract_state`` provides shapes/
        shardings (pass a freshly-initialized state — e.g. engine.init —
        possibly device_put onto the current mesh; orbax reshards to it)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                data=ocp.args.JsonRestore(),
            ),
        )
        return out["state"], out["data"]

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
