"""End-to-end data layer tests on a synthetic raw recording:
preprocess -> HDF5 -> Recording/StreamView -> schedulers -> Batch.
"""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from rvt_tpu.cli.preprocess import process_recording, stacked_histogram_np
from rvt_tpu.data.sequence import RandomAccessView, Recording, StreamView, ev_repr_range_indices
from rvt_tpu.data.streaming import EvalStreamScheduler, TrainStreamScheduler

BBOX_DTYPE = np.dtype({
    "names": ["t", "x", "y", "w", "h", "class_id", "track_id", "class_confidence"],
    "formats": ["<i8", "<f4", "<f4", "<f4", "<f4", "<u4", "<u4", "<f4"],
    "offsets": [0, 8, 12, 16, 20, 24, 28, 32], "itemsize": 40})


def _make_raw_recording(tmp_path, name, duration_s=3.0, seed=0):
    """Synthetic gen1-like raw recording: uniform random events + labels at
    4 Hz starting at 0.5 s."""
    rng = np.random.RandomState(seed)
    n_events = int(duration_s * 50_000)
    t = np.sort(rng.randint(0, int(duration_s * 1e6), n_events)).astype(np.int64)
    x = rng.randint(0, 304, n_events).astype(np.uint16)
    y = rng.randint(0, 240, n_events).astype(np.uint16)
    p = rng.randint(0, 2, n_events).astype(np.int8)

    h5_file = tmp_path / f"{name}_td.dat.h5"
    with h5py.File(str(h5_file), "w") as f:
        g = f.create_group("events")
        g.create_dataset("x", data=x)
        g.create_dataset("y", data=y)
        g.create_dataset("p", data=p)
        g.create_dataset("t", data=t)

    label_ts = np.arange(500_000, int(duration_s * 1e6), 250_000, dtype=np.int64)
    rows = []
    for ts in label_ts:
        for _ in range(rng.randint(1, 4)):
            w, h = rng.uniform(20, 80), rng.uniform(15, 60)
            rows.append((ts, rng.uniform(0, 304 - w), rng.uniform(0, 240 - h),
                         w, h, rng.randint(0, 2), 0, 1.0))
    labels = np.array(rows, dtype=BBOX_DTYPE)
    npy_file = tmp_path / f"{name}_bbox.npy"
    np.save(str(npy_file), labels)
    return npy_file, h5_file


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("gen1_synth")
    for i, name in enumerate(["rec_a", "rec_b", "rec_c"]):
        raw = root / "raw"
        raw.mkdir(exist_ok=True)
        npy, h5 = _make_raw_recording(raw, name, duration_s=2.5 + i, seed=i)
        ok = process_recording(npy, h5, root / "val" / name, "gen1", "val")
        assert ok
    return root / "val"


def test_preprocessed_layout(dataset_dir):
    rec_dir = dataset_dir / "rec_a"
    assert (rec_dir / "labels_v2" / "labels.npz").exists()
    repr_dir = rec_dir / "event_representations_v2" / "stacked_histogram_dt=50_nbins=10"
    assert (repr_dir / "event_representations.h5").exists()
    with h5py.File(str(repr_dir / "event_representations.h5"), "r") as f:
        data = f["data"]
        assert data.shape[1:] == (20, 240, 304)
        assert data.dtype == np.uint8
        assert np.asarray(data[0]).sum() > 0
    # repr timestamp grid: 50 ms before the first label, then
    # count * (100ms // 50ms) reprs per label gap (the reference formula at
    # preprocess_dataset.py:386 — for 4 Hz gen1 labels that is 125 ms);
    # every labelled frame must align exactly with a repr timestamp.
    ts = np.load(str(repr_dir / "timestamps_us.npy"))
    assert np.all(np.diff(ts) > 0)
    fr2repr = np.load(str(repr_dir / "objframe_idx_2_repr_idx.npy"))
    label_ts = np.load(str(rec_dir / "labels_v2" / "timestamps_us.npy"))
    np.testing.assert_array_equal(ts[fr2repr], label_ts)
    first_label = label_ts[0]
    pre = ts[ts < first_label]
    assert np.all(np.diff(np.concatenate([pre, [first_label]])) == 50_000)


def test_recording_and_stream_view(dataset_dir):
    rec = Recording(dataset_dir / "rec_a", "stacked_histogram_dt=50_nbins=10",
                    original_hw=(240, 304), max_labels_per_frame=8)
    view = StreamView(rec, seq_len=5)
    w0 = view[0]
    assert w0["ev_repr"].shape == (5, 20, 240, 304)
    assert w0["is_first_sample"]
    assert not view[1]["is_first_sample"]
    # frame_valid implies labels present
    for i in range(len(view)):
        w = view[i]
        assert np.array_equal(w["frame_valid"], w["label_mask"].any(-1))
    # last window tail may be padded
    w_last = view[len(view) - 1]
    assert w_last["is_padded"].dtype == bool


def test_guaranteed_label_ranges():
    idx = np.array([3, 8, 13, 40, 45])
    ranges = ev_repr_range_indices(idx, max_len=5)
    assert ranges == [(0, 14), (36, 46)]
    for s, e in ranges:
        assert e > s


def test_random_access_view(dataset_dir):
    rec = Recording(dataset_dir / "rec_b", "stacked_histogram_dt=50_nbins=10",
                    original_hw=(240, 304), max_labels_per_frame=8)
    view = RandomAccessView(rec, seq_len=5)
    assert len(view) > 0
    s = view[0]
    assert s["is_first_sample"]
    assert s["frame_valid"][-1]  # window ends at a labelled frame


def test_eval_scheduler_covers_all_windows(dataset_dir):
    recs = [Recording(dataset_dir / n, "stacked_histogram_dt=50_nbins=10",
                      original_hw=(240, 304), max_labels_per_frame=8)
            for n in ["rec_a", "rec_b", "rec_c"]]
    views = [StreamView(r, seq_len=5) for r in recs]
    total_windows = sum(len(v) for v in views)
    sched = EvalStreamScheduler(views, batch_size=2)
    batches = list(sched)
    assert len(batches) == len(sched)
    # all real (non-fill) windows appear exactly once
    n_real = sum(int(~b.is_padded[l].all()) for b in batches
                 for l in range(b.batch_size))
    assert n_real == total_windows
    for b in batches:
        b.validate()


def test_train_scheduler_infinite_and_resets(dataset_dir):
    recs = [Recording(dataset_dir / n, "stacked_histogram_dt=50_nbins=10",
                      original_hw=(240, 304), max_labels_per_frame=8)
            for n in ["rec_a", "rec_b"]]
    streams = []
    for r in recs:
        streams.extend(StreamView.with_guaranteed_labels(r, 5))
    sched = TrainStreamScheduler(streams, batch_size=3, seed=1)
    it = iter(sched)
    batches = [next(it) for _ in range(10)]
    # every batch well-formed; first batch must reset all lanes
    assert batches[0].is_first_sample.all()
    for b in batches:
        b.validate()
        assert b.ev_repr.shape == (3, 5, 240, 304, 20)
    # training windows should contain labels in (nearly) every window
    n_frames_with_labels = sum(b.frame_valid.sum() for b in batches)
    assert n_frames_with_labels > 0


def test_stacked_histogram_np_matches_device_op():
    import jax.numpy as jnp

    from rvt_tpu.ops.voxelization import stacked_histogram

    rng = np.random.RandomState(0)
    n, H, W, bins = 3000, 24, 32, 10
    x = rng.randint(0, W, n)
    y = rng.randint(0, H, n)
    p = rng.randint(0, 2, n)
    t = np.sort(rng.randint(0, 50_000, n))
    a = stacked_histogram_np(x, y, p, t, bins, H, W)
    pad = lambda v: jnp.asarray(np.pad(v, (0, 4096 - n)))
    b = np.asarray(stacked_histogram(pad(x), pad(y), pad(p), pad(t),
                                     jnp.asarray(n), bins, H, W))
    np.testing.assert_array_equal(a, b)
