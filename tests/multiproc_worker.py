"""Worker for the real 2-process `jax.distributed` integration test.

Run as:  python tests/multiproc_worker.py <port> <pid> <nprocs> <outdir>
         <scenario>

Each process builds its shard of a deterministic synthetic detection set,
merges buffers through the REAL ``merge_evaluator_buffers`` /
``allgather_bytes`` (gloo CPU collectives over a localhost coordinator —
no monkeypatching), evaluates the merged set, and writes its metrics to
``<outdir>/metrics_<pid>.json``. It also exercises the checkpoint gate:
only ``is_main_process()`` writes ``<outdir>/ckpt_rank<pid>``.

Scenarios:
  * "interleave" — frames dealt round-robin over processes,
  * "empty" — process 0 holds everything; higher ranks contribute an
    EMPTY buffer (pins the zero-length-payload edge of allgather_bytes).

Reference behavior being reproduced: DDP rank>0 metric sync + rank-0
checkpointing (modules/detection.py:319-334, train.py:60-67).
"""
from __future__ import annotations

import json
import sys

import numpy as np


def make_frames(n: int):
    """Deterministic labelled/predicted frame pairs with nonzero overlap so
    the merged AP is discriminative (a dropped or duplicated shard moves
    it)."""
    from rvt_tpu.evaluation.prophesee import BBOX_DTYPE

    gt_frames, pred_frames = [], []
    rng = np.random.RandomState(1234)
    for j in range(n):
        t_us = 600_000 + j * 100_000
        m = 1 + (j % 3)
        gt = np.zeros(m, BBOX_DTYPE)
        gt["t"] = t_us
        gt["x"] = rng.uniform(0, 40, m)
        gt["y"] = rng.uniform(0, 30, m)
        gt["w"] = rng.uniform(15, 30, m)
        gt["h"] = rng.uniform(12, 24, m)
        gt["class_id"] = rng.randint(0, 2, m)
        pred = gt.copy()
        # half the frames detect well (small jitter), half miss one box
        pred["x"] += rng.uniform(-2, 2, m)
        pred["class_confidence"] = rng.uniform(0.6, 0.95, m)
        if j % 2:
            pred = pred[:-1]
        gt_frames.append(gt)
        pred_frames.append(pred)
    return gt_frames, pred_frames


def shard_indices(n: int, pid: int, nprocs: int, scenario: str):
    if scenario == "empty":
        return list(range(n)) if pid == 0 else []
    return list(range(pid, n, nprocs))


def build_evaluator(pid: int, nprocs: int, scenario: str, n_frames: int = 10):
    from rvt_tpu.evaluation.prophesee import PropheseeEvaluator

    gt, pred = make_frames(n_frames)
    idx = shard_indices(n_frames, pid, nprocs, scenario)
    ev = PropheseeEvaluator("gen1")
    if idx:
        ev.add_labels([gt[i] for i in idx])
        ev.add_predictions([pred[i] for i in idx])
    return ev


def single_process_oracle(n_frames: int = 10):
    """Full-set metrics computed without any distribution (the answer every
    process must reproduce after the merge)."""
    ev = build_evaluator(0, 1, "interleave", n_frames)
    return ev.evaluate_buffer(64, 80)


def main() -> None:
    port, pid, nprocs, outdir, scenario = sys.argv[1:6]
    pid, nprocs = int(pid), int(nprocs)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs

    from pathlib import Path

    from rvt_tpu.parallel.multihost import (is_main_process,
                                            merge_evaluator_buffers)

    out = Path(outdir)
    ev = build_evaluator(pid, nprocs, scenario)
    merge_evaluator_buffers(ev)  # the REAL allgather path
    metrics = ev.evaluate_buffer(64, 80)
    (out / f"metrics_{pid}.json").write_text(json.dumps(metrics))

    # checkpoint gate: only the main process may touch shared storage
    if is_main_process():
        (out / f"ckpt_rank{pid}").write_text("ckpt")
    print(f"[p{pid}] done", flush=True)


if __name__ == "__main__":
    main()
