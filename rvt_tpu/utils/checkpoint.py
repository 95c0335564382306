"""Orbax checkpointing: best-by-monitored-metric + recent-k.

Replaces the reference's PL ModelCheckpoint (val/AP, top-1 + last,
``callbacks/custom.py:8-31``) and the W&B-artifact checkpoint upload/resume
(``loggers/wandb_logger.py:77-87``) with local orbax checkpoints.

Retention matches the reference: the checkpoint with the best monitored
metric is preserved in its own one-slot ``best/`` manager (so recency-based
deletion of the rolling ``orbax/`` directory can never evict it), alongside
the ``keep`` most recent steps for resume.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: Path, monitor: str = "AP", keep: int = 2):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self._best: Optional[float] = None
        self._mgr = ocp.CheckpointManager(
            self.directory / "orbax",
            options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                 create=True))
        self._best_mgr = ocp.CheckpointManager(
            self.directory / "best",
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True))
        meta = self.directory / "best.json"
        if meta.exists():
            self._best = json.loads(meta.read_text()).get("best")

    def save(self, state: Any, step: int, metric: Optional[float] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        if metric is not None and (self._best is None or metric >= self._best):
            self._best = float(metric)
            self._best_mgr.save(step, args=ocp.args.StandardSave(state))
            self._best_mgr.wait_until_finished()
            (self.directory / "best.json").write_text(
                json.dumps({"best": self._best, "step": step,
                            "monitor": self.monitor}))

    def restore(self, target: Any, step: Optional[int] = None) -> Optional[Any]:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def restore_best(self, target: Any) -> Optional[Any]:
        """Restore the checkpoint with the best monitored metric (kept even
        after newer, worse steps rotate the recency window)."""
        step = self._best_mgr.latest_step()
        if step is None:
            return None
        return self._best_mgr.restore(step,
                                      args=ocp.args.StandardRestore(target))

    def best_step(self) -> Optional[int]:
        return self._best_mgr.latest_step()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()
