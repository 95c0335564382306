"""Parallel input-pipeline loader: pooled fetches must produce batch
streams bit-identical to the serial schedulers (round-3 verdict item #3:
the reference parallelizes via DataLoader worker processes,
modules/data/genx.py:92; we parallelize the pure fetch step instead and
keep planning serial/deterministic)."""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from rvt_tpu.cli.preprocess import process_recording
from rvt_tpu.data.loader import ParallelBatchLoader, make_loader
from rvt_tpu.data.sequence import Recording, StreamView
from rvt_tpu.data.streaming import EvalStreamScheduler, TrainStreamScheduler

from tests.test_data_pipeline import _make_raw_recording

REPR = "stacked_histogram_dt=50_nbins=10"


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("gen1_loader")
    for i, name in enumerate(["rec_a", "rec_b"]):
        raw = root / "raw"
        raw.mkdir(exist_ok=True)
        npy, h5 = _make_raw_recording(raw, name, duration_s=2.0 + i, seed=10 + i)
        assert process_recording(npy, h5, root / "val" / name, "gen1", "val")
    return root / "val"


def _views(data_dir, seq_len=5, **kw):
    recs = [Recording(p, REPR, (240, 304), **kw)
            for p in sorted(data_dir.iterdir())]
    return [StreamView(r, seq_len) for r in recs]


def _batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        for f in ("ev_repr", "labels", "label_mask", "frame_valid",
                  "is_first_sample", "is_padded"):
            np.testing.assert_array_equal(getattr(x, f), getattr(y, f), err_msg=f)


@pytest.mark.parametrize("mode", ["thread", "process"])
def test_eval_loader_identical_to_serial(data_dir, mode):
    views = _views(data_dir)
    serial = list(EvalStreamScheduler(views, batch_size=2))
    sched = EvalStreamScheduler(_views(data_dir), batch_size=2)
    loader = ParallelBatchLoader(sched, num_workers=2, mode=mode,
                                 prefetch_batches=3)
    assert len(loader) == len(serial)
    _batches_equal(list(loader), serial)


@pytest.mark.parametrize("mode", ["thread", "process"])
def test_train_loader_identical_to_serial(data_dir, mode):
    from itertools import islice

    from rvt_tpu.data.augmentor import SpatialAugmentor

    def make_sched():
        aug = SpatialAugmentor((240, 304), prob_hflip=0.5, rotate_prob=0.3,
                               zoom_prob=0.5)
        return TrainStreamScheduler(_views(data_dir), batch_size=2, seed=3,
                                    augment_fn=aug)

    serial = list(islice(iter(make_sched()), 12))
    loader = ParallelBatchLoader(make_sched(), num_workers=2, mode=mode,
                                 prefetch_batches=4)
    _batches_equal(list(islice(iter(loader), 12)), serial)


def test_thread_loader_with_raw_chunk_reader(data_dir):
    """prefer_raw_chunks (ctypes blosc decode outside h5py's lock) must be
    byte-identical to the plugin/h5py read path through the loader."""
    serial = list(EvalStreamScheduler(_views(data_dir), batch_size=2))
    sched = EvalStreamScheduler(_views(data_dir, prefer_raw_chunks=True),
                                batch_size=2)
    loader = ParallelBatchLoader(sched, num_workers=3, mode="thread")
    _batches_equal(list(loader), serial)


def test_make_loader_serial_passthrough(data_dir):
    sched = EvalStreamScheduler(_views(data_dir), batch_size=2)
    assert make_loader(sched, num_workers=0) is sched
    # transform hook applies on the serial path too
    def xf(b):
        b.ev_repr[:] = 0
        return b
    loader = make_loader(EvalStreamScheduler(_views(data_dir), 2),
                         num_workers=0, transform=xf)
    first = next(iter(loader))
    assert (first.ev_repr == 0).all()
