"""Random-access + mixed schedulers on the synthetic dataset."""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from rvt_tpu.data.random_access import (MixedScheduler, RandomAccessScheduler,
                                        class_frequency_weights,
                                        split_batch_size)
from rvt_tpu.data.sequence import RandomAccessView, Recording, StreamView
from rvt_tpu.data.streaming import TrainStreamScheduler

from .test_data_pipeline import dataset_dir  # fixture  # noqa: F401


def _views(dataset_dir, names=("rec_a", "rec_b")):
    recs = [Recording(dataset_dir / n, "stacked_histogram_dt=50_nbins=10",
                      original_hw=(240, 304), max_labels_per_frame=8)
            for n in names]
    return [RandomAccessView(r, seq_len=5) for r in recs], recs


def test_random_scheduler(dataset_dir):  # noqa: F811
    views, _ = _views(dataset_dir)
    sched = RandomAccessScheduler(views, batch_size=3, seed=0)
    it = iter(sched)
    for _ in range(4):
        b = next(it)
        b.validate()
        assert b.is_first_sample.all()  # state reset every batch
        assert b.frame_valid[:, -1].all()  # windows end at labelled frames


def test_weighted_sampling_weights(dataset_dir):  # noqa: F811
    views, _ = _views(dataset_dir)
    w = class_frequency_weights(views)
    assert len(w) == sum(len(v) for v in views)
    assert np.all(w > 0)
    sched = RandomAccessScheduler(views, batch_size=2, seed=0, weighted=True)
    b = next(iter(sched))
    b.validate()


def test_mixed_scheduler_layout(dataset_dir):  # noqa: F811
    views, recs = _views(dataset_dir)
    streams = []
    for r in recs:
        streams.extend(StreamView.with_guaranteed_labels(r, 5))
    n_stream, n_random = split_batch_size(4)
    assert (n_stream, n_random) == (2, 2)
    mixed = MixedScheduler(
        TrainStreamScheduler(streams, n_stream, seed=0),
        RandomAccessScheduler(views, n_random, seed=1))
    assert mixed.batch_size == 4
    it = iter(mixed)
    b0 = next(it)
    b0.validate()
    # random lanes (last n_random) always reset; stream lanes reset only at
    # stream starts (merge order: stream first — modules/utils/detection.py)
    assert b0.is_first_sample[n_stream:].all()
    b1 = next(it)
    assert b1.is_first_sample[n_stream:].all()
    assert not b1.is_first_sample[:n_stream].any()  # streams continue
