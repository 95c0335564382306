"""Full-path integration: synthetic preprocessed dataset -> mixed
scheduler -> Trainer.fit -> streaming eval (the train CLI flow)."""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from rvt_tpu.config import preset
from rvt_tpu.data.random_access import (MixedScheduler, RandomAccessScheduler,
                                        split_batch_size)
from rvt_tpu.data.augmentor import SpatialAugmentor
from rvt_tpu.data.prefetch import PrefetchIterator
from rvt_tpu.data.sequence import RandomAccessView, Recording, StreamView
from rvt_tpu.data.streaming import EvalStreamScheduler, TrainStreamScheduler
from rvt_tpu.training.evaluator_loop import run_streaming_eval
from rvt_tpu.training.trainer import Trainer, TrainerConfig

from .test_eval_loop import small_dataset  # fixture  # noqa: F401


def _cfg():
    return preset("gen1", "tiny", resolution_hw=(64, 80), sequence_length=5,
                  max_labels_per_frame=8, max_labeled_frames=4)


def test_train_cli_flow(small_dataset, tmp_path):  # noqa: F811
    cfg = _cfg()
    recs = [Recording(p, cfg.dataset.ev_repr_name, original_hw=(64, 80),
                      max_labels_per_frame=8)
            for p in sorted(small_dataset.iterdir())]
    streams = []
    for r in recs:
        streams.extend(StreamView.with_guaranteed_labels(
            r, cfg.dataset.sequence_length))
    rnd_views = [RandomAccessView(r, cfg.dataset.sequence_length) for r in recs]

    n_stream, n_random = split_batch_size(4)
    aug = SpatialAugmentor.for_mode(cfg.dataset, "stream")
    mixed = MixedScheduler(
        TrainStreamScheduler(streams, n_stream, seed=0, augment_fn=aug),
        RandomAccessScheduler(rnd_views, n_random, seed=1))

    tcfg = TrainerConfig(max_steps=2, log_every_n_steps=1,
                         ckpt_every_n_steps=2, ckpt_dir=str(tmp_path))
    trainer = Trainer(cfg, tcfg, dp_size=1)
    batches = PrefetchIterator(iter(mixed), prefetch_depth=2)
    metrics = trainer.fit(batches)
    batches.close()
    assert np.isfinite(metrics["loss"])

    # eval with the trained weights over the full val split
    import jax

    variables = {"params": jax.device_get(trainer.state.params),
                 "batch_stats": jax.device_get(trainer.state.batch_stats)}
    views = [StreamView(r, cfg.dataset.sequence_length) for r in recs]
    sched = EvalStreamScheduler(views, batch_size=2)
    out = run_streaming_eval(trainer.model, variables, cfg, iter(sched),
                             batch_size=2)
    assert out is not None and "AP" in out
