"""Blosc-zstd HDF5 support: first-party filter plugin + ctypes fallback.

The published preprocessed datasets are blosc-zstd compressed (reference
utils/preprocessing.py:1-13, sequence_base.py:92-102); these tests prove we
can write and read that format bit-exactly without hdf5plugin.
"""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from rvt_tpu.data import blosc_h5


pytestmark = pytest.mark.skipif(not blosc_h5.register_plugin(),
                                reason="native/libh5blosc.so not built")


def _write(path, data, **opts):
    with h5py.File(str(path), "w") as f:
        f.create_dataset("data", data=data, chunks=(1,) + data.shape[1:],
                         **opts)


def test_plugin_roundtrip_reference_opts(tmp_path):
    """Write with the reference's exact filter opts
    (utils/preprocessing.py:1-13), read back bit-exactly."""
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(7, 20, 24, 32)).astype(np.uint8)
    p = tmp_path / "r.h5"
    _write(p, data, **blosc_h5.blosc_opts(1, "blosc:zstd", "byte"))
    with h5py.File(str(p), "r") as f:
        assert blosc_h5.dataset_uses_blosc(f["data"])
        np.testing.assert_array_equal(f["data"][:], data)


def test_plugin_roundtrip_lz4_and_fallback(tmp_path):
    """blosc-lz4 (the fast-decode deployment codec, cli/preprocess.py
    --compression blosc-lz4): plugin round-trip + ctypes chunk-reader
    interop — the codec travels in the chunk header, so readers need no
    flag."""
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, size=(6, 20, 24, 32)).astype(np.uint8)
    p = tmp_path / "lz4.h5"
    _write(p, data, **blosc_h5.blosc_opts(1, "blosc:lz4", "byte"))
    with h5py.File(str(p), "r") as f:
        ds = f["data"]
        assert blosc_h5.dataset_uses_blosc(ds)
        np.testing.assert_array_equal(ds[:], data)
        fallback = blosc_h5.BloscChunkDataset(ds)
        np.testing.assert_array_equal(fallback[1:5], data[1:5])


def test_plugin_roundtrip_int8(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.integers(-128, 128, size=(4, 10, 16, 20)).astype(np.int8)
    p = tmp_path / "i8.h5"
    _write(p, data, **blosc_h5.blosc_opts())
    with h5py.File(str(p), "r") as f:
        np.testing.assert_array_equal(f["data"][:], data)


def test_chunks_are_genuine_blosc_frames(tmp_path):
    """Raw chunks must decode through libblosc directly (the same library
    hdf5plugin wraps) — proves on-disk interop with reference-written
    files, not just self-consistency."""
    rng = np.random.default_rng(2)
    data = rng.integers(0, 40, size=(5, 20, 24, 32)).astype(np.uint8)
    p = tmp_path / "frames.h5"
    _write(p, data, **blosc_h5.blosc_opts())
    frame_nbytes = data[0].nbytes
    with h5py.File(str(p), "r") as f:
        ds = f["data"]
        for i in range(data.shape[0]):
            _, raw = ds.id.read_direct_chunk((i, 0, 0, 0))
            flat = blosc_h5.decompress_chunk(raw, frame_nbytes)
            np.testing.assert_array_equal(
                flat.reshape(data.shape[1:]), data[i])


def test_ctypes_fallback_dataset(tmp_path):
    """BloscChunkDataset (used when the filter plugin .so is absent) must
    slice identically to the h5py dataset."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=(9, 6, 8, 10)).astype(np.uint8)
    p = tmp_path / "fb.h5"
    _write(p, data, **blosc_h5.blosc_opts())
    with h5py.File(str(p), "r") as f:
        view = blosc_h5.BloscChunkDataset(f["data"])
        assert len(view) == 9 and view.shape == data.shape
        np.testing.assert_array_equal(view[:], data)
        np.testing.assert_array_equal(view[2:7], data[2:7])
        np.testing.assert_array_equal(view[8:9], data[8:9])
        np.testing.assert_array_equal(view[4], data[4])
        assert view[3:3].shape == (0, 6, 8, 10)


def test_recording_reads_blosc(tmp_path):
    """End-to-end: preprocess writes blosc-zstd; Recording reads it and the
    tensors match a gzip-written copy bit-exactly."""
    from rvt_tpu.cli.preprocess import process_recording
    from rvt_tpu.data.sequence import Recording
    from tests.test_data_pipeline import _make_raw_recording

    npy, h5f = _make_raw_recording(tmp_path, "rec", duration_s=2.0, seed=7)
    assert process_recording(npy, h5f, tmp_path / "blosc" / "rec", "gen1",
                             "val", compression="blosc-zstd")
    assert process_recording(npy, h5f, tmp_path / "gzip" / "rec", "gen1",
                             "val", compression="gzip")
    name = "stacked_histogram_dt=50_nbins=10"
    rec_b = Recording(tmp_path / "blosc" / "rec", name, original_hw=(240, 304))
    rec_g = Recording(tmp_path / "gzip" / "rec", name, original_hw=(240, 304))
    assert rec_b.num_ev_repr == rec_g.num_ev_repr > 0
    np.testing.assert_array_equal(
        rec_b.read_ev_repr(0, rec_b.num_ev_repr),
        rec_g.read_ev_repr(0, rec_g.num_ev_repr))
    # the blosc file must actually carry the 32001 filter
    with h5py.File(str(rec_b.ev_file), "r") as f:
        assert blosc_h5.dataset_uses_blosc(f["data"])
    rec_b.close(), rec_g.close()


def test_preprocess_rerun_match_if_exists(tmp_path):
    """Re-running preprocessing validates outputs against existing files
    (reference preprocess_dataset.py:306-337) and raises on mismatch."""
    from rvt_tpu.cli.preprocess import process_recording
    from tests.test_data_pipeline import _make_raw_recording

    npy, h5f = _make_raw_recording(tmp_path, "rec", duration_s=2.0, seed=11)
    out = tmp_path / "out" / "rec"
    assert process_recording(npy, h5f, out, "gen1", "val")
    # identical re-run passes (and skips the finished event file)
    assert process_recording(npy, h5f, out, "gen1", "val")
    # corrupt the stored labels -> re-run must fail the idempotency check
    labels_npz = out / "labels_v2" / "labels.npz"
    stored = dict(np.load(str(labels_npz)))
    stored["labels"] = stored["labels"][:-1]
    np.savez(str(labels_npz), **stored)
    with pytest.raises(AssertionError, match="re-run mismatch"):
        process_recording(npy, h5f, out, "gen1", "val")


def test_preprocess_mixed_density_and_count_window(tmp_path):
    """mixeddensity_stack + count-window extraction through the offline
    pipeline: reference naming convention, int8 dtype, nonzero content."""
    from rvt_tpu.cli.preprocess import process_recording
    from tests.test_data_pipeline import _make_raw_recording

    npy, h5f = _make_raw_recording(tmp_path, "rec", duration_s=2.0, seed=13)
    out = tmp_path / "out" / "rec"
    assert process_recording(npy, h5f, out, "gen1", "val",
                             representation="mixeddensity_stack", bins=8,
                             count_cutoff=100, ev_repr_delta_ts_ms=None,
                             ev_repr_num_events=5000)
    repr_dir = (out / "event_representations_v2"
                / "mixeddensity_stack_ne=5000_nbins=8_cutoff=100")
    with h5py.File(str(repr_dir / "event_representations.h5"), "r") as f:
        data = f["data"]
        assert data.dtype == np.int8
        assert data.shape[1:] == (8, 240, 304)
        arr = data[-1]
        assert arr.min() < 0 < arr.max()
        assert abs(arr).max() <= 100
