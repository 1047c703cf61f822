"""Orbax checkpointing of the full train state.

Replaces the reference's raw ``torch.save`` ckpt/ema/optim triplets
(``trainModifyCondition.py:813-824``) with a single atomic orbax
checkpoint of {params, ema_params, opt_state, step} plus retention.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState, metrics: Optional[dict] = None) -> None:
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: TrainState, step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def close(self) -> None:
        self._mgr.close()
