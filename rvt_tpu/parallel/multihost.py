"""Multi-host (multi-process) collectives for host-side data.

The reference synchronizes evaluation metrics with an explicit
``dist.barrier`` + ``dist.reduce(SUM)/world_size`` (reference
modules/detection.py:319-334). Here the cross-process exchange rides JAX's
own runtime (``multihost_utils.process_allgather`` over the device mesh) —
no second communication backend to configure.

``allgather_bytes`` exchanges variable-length host byte-strings: lengths
are allgathered first, payloads are zero-padded to the max and allgathered,
then trimmed per sender. Used to merge per-shard Prophesee evaluator
buffers so every process scores the identical full validation set.
"""
from __future__ import annotations

from typing import List

import numpy as np


def is_main_process() -> bool:
    """True on the process that owns shared side effects (checkpoint
    writes, log files). Reference: rank-0 gating in train.py:60-67."""
    import jax

    return jax.process_index() == 0


def allgather_bytes(payload: bytes) -> List[bytes]:
    """Exchange one byte-string per process; returns all of them in
    process order. Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return [payload]
    from jax.experimental import multihost_utils

    arr = np.frombuffer(payload, np.uint8)
    lens = multihost_utils.process_allgather(
        np.asarray(len(arr), np.int64))          # [P]
    maxlen = int(lens.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[:len(arr)] = arr
    stacked = multihost_utils.process_allgather(padded)  # [P, maxlen]
    return [stacked[i, :int(lens[i])].tobytes() for i in range(len(lens))]


def merge_evaluator_buffers(evaluator) -> None:
    """Allgather every process's Prophesee buffers and append the remote
    shards into the local evaluator (in place). No-op single-process."""
    import jax

    if jax.process_count() == 1:
        return
    my_index = jax.process_index()
    payloads = allgather_bytes(evaluator.state_bytes())
    for i, payload in enumerate(payloads):
        if i != my_index:
            evaluator.extend_from_bytes(payload)
