"""Validation/test CLI.

Equivalent of the reference ``validation.py`` (validation.py:28-90): load a
checkpoint (converted torch .ckpt or orbax), run streaming evaluation over
the val or test split, print Prophesee COCO metrics.

    python -m rvt_tpu.cli.validate --dataset gen1 --size tiny \
        --data_dir /data/gen1 --checkpoint rvt-t.ckpt --use_test_set
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["gen1", "gen4"], required=True)
    ap.add_argument("--size", choices=["tiny", "small", "base"], default="tiny")
    ap.add_argument("--data_dir", type=Path, required=True)
    ap.add_argument("--checkpoint", type=Path, required=True)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--use_test_set", action="store_true")
    ap.add_argument("--viz_dir", type=Path, default=None,
                    help="write pred-vs-GT panel PNGs here "
                         "(reference callbacks/detection.py:32-100)")
    ap.add_argument("--viz_every", type=int, default=50)
    ap.add_argument("--num_workers", type=int, default=0,
                    help="parallel input-pipeline fetch workers "
                         "(data/loader.py); 0 = serial")
    ap.add_argument("--loader_mode", choices=["thread", "process"],
                    default="thread")
    ap.add_argument("--serve_fused", action="store_true",
                    help="bf16 compute + fused Pallas serving kernels + "
                         "s2d stem (the bench.py production path; ~1.8x "
                         "faster eval). Default evaluates in f32 for "
                         "strict checkpoint parity.")
    args = ap.parse_args()

    import jax

    from rvt_tpu.cli.train import build_streams
    from rvt_tpu.config import preset
    from rvt_tpu.convert.torch_ckpt import load_torch_checkpoint
    from rvt_tpu.data.streaming import EvalStreamScheduler
    from rvt_tpu.models import RVTDetector
    from rvt_tpu.training.evaluator_loop import run_streaming_eval

    cfg = preset(args.dataset, args.size)
    if args.serve_fused:
        from dataclasses import replace

        cfg = replace(cfg, model=replace(
            cfg.model, compute_dtype="bfloat16",
            backbone=replace(cfg.model.backbone, stem_s2d=True,
                             fused_kernels=True)))
    model = RVTDetector(cfg=cfg.model)

    if str(args.checkpoint).endswith(".ckpt") or str(args.checkpoint).endswith(".pt"):
        variables = load_torch_checkpoint(str(args.checkpoint))
    else:  # orbax TrainState directory
        from rvt_tpu.training import init_train_state, make_optimizer
        from rvt_tpu.utils.checkpoint import CheckpointManager

        optimizer = make_optimizer(cfg.training)
        template = init_train_state(model, cfg, optimizer, jax.random.PRNGKey(0))
        mgr = CheckpointManager(args.checkpoint)
        # prefer the best-by-val/AP checkpoint (the reference evaluates its
        # ModelCheckpoint top-1); fall back to the latest step
        state = mgr.restore_best(template)
        if state is None:
            state = mgr.restore(template)
        assert state is not None, f"no checkpoint at {args.checkpoint}"
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    split = "test" if args.use_test_set else "val"
    streams = build_streams(args.data_dir, split, cfg, train=False)
    sched = EvalStreamScheduler(streams, args.batch_size)
    if args.num_workers:
        from rvt_tpu.data.loader import ParallelBatchLoader

        sched = ParallelBatchLoader(sched, args.num_workers,
                                    mode=args.loader_mode)
    metrics = run_streaming_eval(model, variables, cfg, iter(sched),
                                 args.batch_size, viz_dir=args.viz_dir,
                                 viz_every=args.viz_every)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
