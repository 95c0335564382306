"""Metrics logging: JSONL always; TensorBoard when available.

Replaces the reference's heavily customised W&B logger
(``loggers/wandb_logger.py:29-376``). W&B is unavailable offline, so the
durable record is a JSONL stream (one line per logged step) that any
dashboard can tail; TensorBoard summaries are written when tensorflow is
importable (it is in this image, but import is lazy — it costs ~60 s).
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict


class MetricsLogger:
    def __init__(self, path: Path, tensorboard: bool = False):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf  # lazy: slow import

                self._tb = tf.summary.create_file_writer(
                    str(self.path.parent / "tb"))
            except ImportError:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        with self.path.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, v, step=step)
            self._tb.flush()
