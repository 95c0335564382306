"""Native C++ kernels vs their numpy references."""
import numpy as np
import pytest

from rvt_tpu import native_lib


@pytest.fixture(scope="module")
def lib():
    lib = native_lib.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_native_histogram_matches_numpy(lib):
    from rvt_tpu.cli.preprocess import stacked_histogram_np

    rng = np.random.RandomState(0)
    n, H, W, bins = 20000, 24, 32, 10
    x = rng.randint(0, W, n)
    y = rng.randint(0, H, n)
    p = rng.randint(0, 2, n)
    t = np.sort(rng.randint(0, 50000, n))
    native = native_lib.stacked_histogram_u8(x, y, p, t, bins, H, W)
    # pure-numpy path
    hist = np.zeros((2 * bins, H, W), np.int32)
    t_norm = (t - t[0]) / max(int(t[-1] - t[0]), 1)
    t_idx = np.clip(np.floor(t_norm * bins).astype(np.int64), 0, bins - 1)
    np.add.at(hist, (p * bins + t_idx, y, x), 1)
    expected = np.minimum(hist, 255).astype(np.uint8)
    np.testing.assert_array_equal(native, expected)
    # and the public entry point routes through whichever is available
    via_api = stacked_histogram_np(x, y, p, t, bins, H, W)
    np.testing.assert_array_equal(via_api, expected)


def test_native_time_running_max(lib):
    t = np.array([0, 5, 3, 9, 2, 9, 11], np.int64)
    out = native_lib.time_running_max(t.copy())
    np.testing.assert_array_equal(out, np.maximum.accumulate(t))


def test_native_coco_matcher_equals_python(lib, monkeypatch):
    """Full evaluator must produce identical metrics with and without the
    native matcher."""
    from rvt_tpu.evaluation import coco

    rng = np.random.RandomState(1)
    gts, dts = [], []
    for _ in range(8):
        n = rng.randint(1, 5)
        g = np.zeros((n, 5))
        g[:, 0] = rng.uniform(0, 200, n)
        g[:, 1] = rng.uniform(0, 150, n)
        g[:, 2] = rng.uniform(8, 90, n)
        g[:, 3] = rng.uniform(8, 90, n)
        g[:, 4] = rng.randint(0, 2, n)
        m = rng.randint(0, 6)
        d = np.zeros((m, 6))
        d[:, 0] = rng.uniform(0, 200, m)
        d[:, 1] = rng.uniform(0, 150, m)
        d[:, 2] = rng.uniform(8, 90, m)
        d[:, 3] = rng.uniform(8, 90, m)
        d[:, 4] = rng.randint(0, 2, m)
        d[:, 5] = rng.uniform(0.1, 1, m)
        # overlay some near-perfect detections
        k = min(n, m)
        d[:k, :4] = g[:k, :4] + rng.normal(0, 2, (k, 4))
        d[:k, 4] = g[:k, 4]
        gts.append(g)
        dts.append(d)

    with_native = coco.evaluate_coco_map(gts, dts, num_classes=2)
    monkeypatch.setattr(native_lib, "coco_match_image",
                        lambda *a, **k: None)
    without = coco.evaluate_coco_map(gts, dts, num_classes=2)
    for k in with_native:
        np.testing.assert_allclose(with_native[k], without[k], rtol=1e-9,
                                   err_msg=k)


def _reference_representations():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    import reference_shim
    reference_shim.install_shims()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from data.utils.representations import (MixedDensityEventStack,
                                            StackedHistogram)
    return StackedHistogram, MixedDensityEventStack


def _hot_events(seed=42, n=80000, H=16, W=20):
    """Events concentrated on few pixels so uint8 accumulation wraps."""
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 4, n).astype(np.int32)
    y = rng.integers(0, 3, n).astype(np.int32)
    p = rng.integers(0, 2, n).astype(np.int32)
    t = np.sort(rng.integers(0, 50000, n)).astype(np.int64)
    return x, y, p, t, H, W


def test_native_histogram_fastmode_wraps_like_reference(lib):
    """fastmode must reproduce the reference default (uint8 wraparound on
    >255-event cells, representations.py:48,79-81) bit-exactly — required
    for parity with reference-preprocessed datasets (ADVICE round 1)."""
    import torch as th

    StackedHistogram, _ = _reference_representations()
    x, y, p, t, H, W = _hot_events()
    bins = 10
    for fastmode in (True, False):
        ref = StackedHistogram(bins=bins, height=H, width=W,
                               fastmode=fastmode)
        want = ref.construct(
            th.asarray(x.astype(np.int64)), th.asarray(y.astype(np.int64)),
            th.asarray(p.astype(np.int64)), th.asarray(t)
        ).numpy().reshape(2 * bins, H, W)
        got = native_lib.stacked_histogram_u8(x, y, p, t, bins, H, W,
                                              fastmode=fastmode)
        np.testing.assert_array_equal(got, want)
    # wraparound actually exercised: fast and slow modes must differ here
    fast = native_lib.stacked_histogram_u8(x, y, p, t, bins, H, W,
                                           fastmode=True)
    slow = native_lib.stacked_histogram_u8(x, y, p, t, bins, H, W,
                                           fastmode=False)
    assert not np.array_equal(fast, slow)


def test_native_mixed_density_matches_reference(lib):
    """mixed_density_stack_i8 vs the reference MixedDensityEventStack
    (representations.py:130-218), incl. int8 wrap and cutoff variants."""
    import torch as th

    from rvt_tpu.cli.preprocess import mixed_density_np

    _, MixedDensityEventStack = _reference_representations()
    x, y, p, t, H, W = _hot_events(seed=3, n=30000)
    bins = 8
    for cutoff in (None, 100, 5):
        ref = MixedDensityEventStack(bins=bins, height=H, width=W,
                                     count_cutoff=cutoff)
        want = ref.construct(
            th.asarray(x.astype(np.int64)), th.asarray(y.astype(np.int64)),
            th.asarray(p.astype(np.int64)), th.asarray(t)).numpy()
        got = native_lib.mixed_density_stack_i8(x, y, p, t, bins, H, W,
                                                cutoff)
        np.testing.assert_array_equal(got, want)
        via_api = mixed_density_np(x, y, p, t, bins, H, W, cutoff)
        np.testing.assert_array_equal(via_api, want)
