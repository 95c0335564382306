"""Training CLI.

Equivalent of the reference ``train.py`` (hydra main, train.py:32-142) with
argparse + dataclass presets instead of hydra composition:

    python -m rvt_tpu.cli.train --dataset gen1 --size tiny \
        --data_dir /data/gen1 --ckpt_dir runs/gen1_tiny

Mixed train sampling (stream + random lanes, modules/data/genx.py:116-140)
is selected with --sampling mixed; validation runs every --val_every steps
on the val split.
"""
from __future__ import annotations

import argparse
import random
from pathlib import Path


def build_streams(data_dir: Path, split: str, cfg, train: bool):
    from rvt_tpu.data.sequence import Recording, StreamView

    split_dir = data_dir / split
    assert split_dir.is_dir(), split_dir
    streams = []
    for rec_dir in sorted(p for p in split_dir.iterdir() if p.is_dir()):
        rec = Recording(rec_dir, cfg.dataset.ev_repr_name,
                        original_hw=cfg.dataset.resolution_hw,
                        downsample_by_factor_2=cfg.dataset.downsample_by_factor_2,
                        max_labels_per_frame=cfg.dataset.max_labels_per_frame)
        if train:
            streams.extend(StreamView.with_guaranteed_labels(
                rec, cfg.dataset.sequence_length))
        else:
            streams.append(StreamView(rec, cfg.dataset.sequence_length))
    return streams


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["gen1", "gen4"], required=True)
    ap.add_argument("--size", choices=["tiny", "small", "base"], default="tiny")
    ap.add_argument("--data_dir", type=Path, required=True)
    ap.add_argument("--ckpt_dir", type=Path, default=Path("runs/default"))
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--val_every", type=int, default=None)
    ap.add_argument("--log_every", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dp_size", type=int, default=-1)
    ap.add_argument("--num_workers", type=int, default=0,
                    help="input-pipeline fetch workers (reference "
                         "hardware.num_workers, modules/data/genx.py:92); "
                         "0 = serial")
    ap.add_argument("--loader_mode", choices=["thread", "process"],
                    default="thread")
    ap.add_argument("--multihost", action="store_true",
                    help="initialise jax.distributed (multi-host DCN+ICI "
                         "training; requires coordinator env vars)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--init_ckpt", type=Path, default=None,
                    help="reference torch .ckpt for weights-only init "
                         "(use --resume for orbax checkpoints)")
    ap.add_argument("--artifact_dir", type=Path, default=None,
                    help="checkpoint-artifact registry root (shared "
                         "storage); publishes scored checkpoints with "
                         "best/last aliases + a code snapshot (reference "
                         "W&B log_model)")
    ap.add_argument("--artifact_name", default="checkpoint")
    ap.add_argument("--artifact_top_k", type=int, default=1)
    ap.add_argument("--resume_artifact", default=None,
                    help="resume from a registry artifact URI, e.g. "
                         "'checkpoint@best' or 'checkpoint@v3' (requires "
                         "--artifact_dir)")
    args = ap.parse_args()

    if args.multihost:
        # Multi-host SPMD: the same mesh code then spans hosts (DCN between
        # hosts, ICI within). Replaces the reference's DDP backend choice
        # (train.py:60-67) — XLA handles all collectives.
        import jax

        jax.distributed.initialize()

    from rvt_tpu.config import preset
    from rvt_tpu.data.augmentor import SpatialAugmentor
    from rvt_tpu.data.streaming import EvalStreamScheduler, TrainStreamScheduler
    from rvt_tpu.training.evaluator_loop import run_streaming_eval
    from rvt_tpu.training.trainer import Trainer, TrainerConfig

    cfg = preset(args.dataset, args.size)
    if args.batch_size:
        from dataclasses import replace
        cfg = replace(cfg, batch_size=replace(cfg.batch_size,
                                              train=args.batch_size,
                                              eval=args.batch_size))
    tcfg = TrainerConfig(
        max_steps=args.max_steps or cfg.training.max_steps,
        log_every_n_steps=args.log_every,
        val_every_n_steps=args.val_every,
        ckpt_dir=str(args.ckpt_dir),
        artifact_dir=(str(args.artifact_dir)
                      if args.artifact_dir is not None else None),
        artifact_name=args.artifact_name,
        artifact_top_k=args.artifact_top_k,
    )

    trainer = Trainer(cfg, tcfg, seed=args.seed, dp_size=args.dp_size)
    if args.resume_artifact:
        assert trainer.restore_from_artifact(args.resume_artifact), \
            "artifact restore failed"
    elif args.resume:
        assert trainer.restore(), "no checkpoint to resume from"
    elif args.init_ckpt is not None:
        from rvt_tpu.convert.torch_ckpt import load_torch_checkpoint
        trainer.load_weights(load_torch_checkpoint(str(args.init_ckpt)))

    train_streams = build_streams(args.data_dir, "train", cfg, train=True)
    stream_augment = SpatialAugmentor.for_mode(cfg.dataset, "stream")
    sampling = cfg.dataset.train_sampling
    if sampling == "stream":
        scheduler = TrainStreamScheduler(train_streams, cfg.batch_size.train,
                                         seed=args.seed,
                                         augment_fn=stream_augment)
    else:
        from rvt_tpu.data.random_access import (MixedScheduler,
                                                RandomAccessScheduler,
                                                split_batch_size)
        from rvt_tpu.data.sequence import RandomAccessView, Recording

        rnd_views = []
        split_dir = args.data_dir / "train"
        for rec_dir in sorted(p for p in split_dir.iterdir() if p.is_dir()):
            rec = Recording(rec_dir, cfg.dataset.ev_repr_name,
                            original_hw=cfg.dataset.resolution_hw,
                            downsample_by_factor_2=cfg.dataset.downsample_by_factor_2,
                            max_labels_per_frame=cfg.dataset.max_labels_per_frame)
            rnd_views.append(RandomAccessView(
                rec, cfg.dataset.sequence_length,
                only_load_end_labels=cfg.dataset.only_load_end_labels))
        rnd_augment = SpatialAugmentor.for_mode(cfg.dataset, "random")
        if sampling == "random":
            scheduler = RandomAccessScheduler(rnd_views, cfg.batch_size.train,
                                              seed=args.seed,
                                              augment_fn=rnd_augment)
        else:  # mixed (reference w_stream=1, w_random=1)
            n_stream, n_random = split_batch_size(cfg.batch_size.train)
            scheduler = MixedScheduler(
                TrainStreamScheduler(train_streams, n_stream, seed=args.seed,
                                     augment_fn=stream_augment),
                RandomAccessScheduler(rnd_views, n_random, seed=args.seed + 1,
                                      augment_fn=rnd_augment))

    if args.num_workers:
        from rvt_tpu.data.loader import ParallelBatchLoader

        scheduler = ParallelBatchLoader(scheduler, args.num_workers,
                                        mode=args.loader_mode)

    eval_fn = None
    if args.val_every:
        import jax

        val_streams = build_streams(args.data_dir, "val", cfg, train=False)

        def eval_fn(variables):
            # shard recordings across processes (reference: rank-aware
            # stream sharding, stream_sharded_datapipe.py:73-80)
            sched = EvalStreamScheduler(val_streams, cfg.batch_size.eval,
                                        shard_index=jax.process_index(),
                                        num_shards=jax.process_count())
            from rvt_tpu.data.loader import make_loader
            batches = make_loader(sched, args.num_workers,
                                  mode=args.loader_mode)
            return run_streaming_eval(trainer.model, variables, cfg,
                                      iter(batches), cfg.batch_size.eval)

    metrics = trainer.fit(iter(scheduler), eval_fn=eval_fn)
    print({k: round(v, 5) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
