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
    EMPTY buffer (pins the zero-length-payload edge of allgather_bytes),
  * "train" — a REAL distributed train step: a 2-process dp mesh (one
    CPU device per process), one ``make_train_step`` on deterministic
    data; each process writes the md5 of its updated replicated params
    (the test asserts they are bit-identical — the gradient psum crossed
    a process boundary and both replicas applied the same update).

Reference behavior being reproduced: DDP rank>0 metric sync + rank-0
checkpointing (modules/detection.py:319-334, train.py:60-67) and the
DDP gradient all-reduce itself (train.py:60-67).
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


def run_train_scenario(pid: int, nprocs: int, out) -> None:
    """One REAL distributed TBPTT train step over a mesh that spans
    OS-process boundaries (gloo collectives): the gradient psum XLA
    inserts for the dp-sharded batch is the DDP all-reduce equivalent
    (reference train.py:60-67). Writes md5(params_after_step) + loss."""
    import hashlib

    import jax
    import jax.numpy as jnp

    from rvt_tpu.config import preset
    from rvt_tpu.models import RVTDetector
    from rvt_tpu.models.backbone import zero_states
    from rvt_tpu.parallel.mesh import (make_mesh, replicate_tree,
                                       shard_batch_arrays, shard_states)
    from rvt_tpu.training import (init_train_state, make_optimizer,
                                  make_train_step)

    cfg = preset("gen1", "tiny", resolution_hw=(32, 32), sequence_length=2,
                 max_labels_per_frame=4, max_labeled_frames=2)
    model = RVTDetector(cfg=cfg.model)
    optimizer = make_optimizer(cfg.training)
    # identical deterministic init on every process (same seed, same CPU)
    state = init_train_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    mesh = make_mesh()  # all global devices: nprocs x 1 cpu
    assert mesh.size == nprocs, (mesh.size, nprocs)
    state = replicate_tree(mesh, state)

    B, T = 2 * nprocs, cfg.dataset.sequence_length
    H, W = cfg.dataset.dataloading_hw
    M = cfg.dataset.max_labels_per_frame
    rng = np.random.RandomState(7)
    # every process builds the identical GLOBAL batch; shard_batch_arrays
    # places each process's batch rows on its local device
    ev = rng.randint(0, 4, size=(B, T, H, W, 20)).astype(np.float32)
    labels = np.zeros((B, T, M, 7), np.float32)
    label_mask = np.zeros((B, T, M), bool)
    labels[:, -1, 0] = (0, 8.0, 8.0, 12.0, 12.0, 1.0, 1.0)
    label_mask[:, -1, 0] = True
    ev, labels, label_mask, fv, is_first = shard_batch_arrays(
        mesh, ev, labels, label_mask, label_mask.any(-1),
        np.ones((B,), bool))
    states = shard_states(mesh, zero_states(cfg.model.backbone, B))

    step = make_train_step(model, cfg, optimizer, donate=False, mesh=mesh)
    new_state, _, metrics = step(state, states, ev, labels, label_mask,
                                 fv, is_first)
    loss = float(metrics["loss"])

    h = hashlib.md5()
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            new_state.params)[0]:
        h.update("/".join(str(getattr(p, "key", p)) for p in path).encode())
        # replicated output: every process holds a full local copy
        h.update(np.ascontiguousarray(
            np.asarray(jax.device_get(leaf.addressable_data(0)))).tobytes())
    (out / f"metrics_{pid}.json").write_text(json.dumps(
        {"params_md5": h.hexdigest(), "loss": loss,
         "grad_norm": float(metrics["grad_norm"]),
         "process_count": jax.process_count()}))
    print(f"[p{pid}] train done", flush=True)


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
    if scenario == "train":
        run_train_scenario(pid, nprocs, out)
        return
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
