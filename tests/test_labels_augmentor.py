"""Label geometric ops vs the reference torch ObjectLabels, augmentor
behaviour, and PSEE raw-file round-trips."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import sys  # noqa: E402

sys.path.insert(0, "/root/reference")

from rvt_tpu.data import labels as L  # noqa: E402
from rvt_tpu.data.augmentor import SpatialAugmentor, nearest_exact_resize  # noqa: E402


def _ref_labels(rows, hw):
    from data.genx_utils.labels import ObjectLabels

    t = torch.zeros((len(rows), 7))
    for i, (x, y, w, h, cls) in enumerate(rows):
        t[i] = torch.tensor([1000.0, x, y, w, h, cls, 1.0])
    return ObjectLabels(t.clone(), input_size_hw=hw)


def _ours(rows):
    out = np.zeros((len(rows), 7), np.float32)
    for i, (x, y, w, h, cls) in enumerate(rows):
        out[i] = (1000.0, x, y, w, h, cls, 1.0)
    return out


ROWS = [(10.0, 20.0, 60.0, 40.0, 0), (150.0, 100.0, 80.0, 70.0, 1),
        (250.0, 200.0, 50.0, 35.0, 0)]
HW = (240, 304)


def test_flip_lr_matches_reference():
    ref = _ref_labels(ROWS, HW)
    ref.flip_lr_()
    ours = L.flip_lr(_ours(ROWS), HW)
    np.testing.assert_allclose(ours[:, 1], ref.x.numpy(), rtol=1e-6)


def test_scale_matches_reference():
    for mult in (0.5, 1.25):
        ref = _ref_labels(ROWS, HW)
        ref.scale_(scaling_multiplier=mult)
        ours, new_hw = L.scale(_ours(ROWS), HW, mult)
        np.testing.assert_allclose(ours[:, 1:5],
                                   ref.object_labels[:, 1:5].numpy(),
                                   rtol=1e-5)


def test_zoom_in_matches_reference():
    ref = _ref_labels(ROWS, HW)
    ref.zoom_in_and_rescale_(zoom_coordinates_x0y0=(30, 20), zoom_in_factor=1.4)
    ours = L.zoom_in_and_rescale(_ours(ROWS), HW, (30, 20), 1.4)
    assert len(ours) == len(ref)
    np.testing.assert_allclose(ours[:, 1:5],
                               ref.object_labels[:, 1:5].numpy(), rtol=1e-4)


def test_zoom_out_matches_reference():
    ref = _ref_labels(ROWS, HW)
    ref.zoom_out_and_rescale_(zoom_coordinates_x0y0=(40, 25), zoom_out_factor=1.2)
    ours = L.zoom_out_and_rescale(_ours(ROWS), HW, (40, 25), 1.2)
    np.testing.assert_allclose(ours[:, 1:5],
                               ref.object_labels[:, 1:5].numpy(), rtol=1e-4)


def test_rotate_matches_reference():
    ref = _ref_labels(ROWS, HW)
    ref.rotate_(angle_deg=5.0)
    ours = L.rotate(_ours(ROWS), HW, 5.0)
    np.testing.assert_allclose(ours[:, 1:5],
                               ref.object_labels[:, 1:5].numpy(),
                               rtol=1e-4, atol=1e-3)


def test_nearest_exact_resize_matches_torch():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, size=(3, 24, 36)).astype(np.uint8)
    small = nearest_exact_resize(img, (12, 18))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(img)[None].float(), size=(12, 18),
        mode="nearest-exact")[0].numpy().astype(np.uint8)
    np.testing.assert_array_equal(small, ref)
    big = nearest_exact_resize(img, (48, 72))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(img)[None].float(), size=(48, 72),
        mode="nearest-exact")[0].numpy().astype(np.uint8)
    np.testing.assert_array_equal(big, ref)


def _window(rng, T=3, M=6, H=48, W=64):
    ev = rng.randint(0, 5, size=(T, 4, H, W)).astype(np.uint8)
    labels = np.zeros((T, M, 7), np.float32)
    mask = np.zeros((T, M), bool)
    labels[1, 0] = (1000, 5.0, 8.0, 20.0, 16.0, 0, 1.0)
    mask[1, 0] = True
    labels[2, 0] = (1500, 30.0, 20.0, 18.0, 14.0, 1, 1.0)
    mask[2, 0] = True
    return {"ev_repr": ev, "labels": labels, "label_mask": mask,
            "frame_valid": mask.any(-1), "is_first_sample": np.asarray(True),
            "is_padded": np.zeros(T, bool)}


def test_augmentor_hflip_consistency():
    import random

    rng = np.random.RandomState(0)
    w = _window(rng)
    aug = SpatialAugmentor((48, 64), prob_hflip=1.0, zoom_prob=0.0)
    st = aug.sample_state(random.Random(0))
    assert st.h_flip
    out = aug.apply(w, st)
    # image flipped
    np.testing.assert_array_equal(out["ev_repr"], w["ev_repr"][..., ::-1])
    # boxes flipped: x' = W - 1 - x - w
    lab = out["labels"][1, 0]
    assert lab[1] == 64 - 1 - 5.0 - 20.0
    # event mass preserved
    assert out["ev_repr"].sum() == w["ev_repr"].sum()


def test_augmentor_zoom_out_consistency():
    import random

    rng = np.random.RandomState(1)
    w = _window(rng)
    aug = SpatialAugmentor((48, 64), prob_hflip=0.0, zoom_prob=1.0,
                           zoom_in_weight=0.0, zoom_out_weight=1.0,
                           zoom_out_min=1.2, zoom_out_max=1.2)
    st = aug.sample_state(random.Random(3))
    assert st.zoom_out is not None
    out = aug.apply(w, st)
    assert out["ev_repr"].shape == w["ev_repr"].shape
    # labels stay in-bounds
    lab = out["labels"][out["label_mask"]]
    assert np.all(lab[:, 1] >= 0) and np.all(lab[:, 1] + lab[:, 3] <= 64)


def test_augmentor_zoom_in_keeps_a_label():
    import random

    rng = np.random.RandomState(2)
    w = _window(rng)
    aug = SpatialAugmentor((48, 64), prob_hflip=0.0, zoom_prob=1.0,
                           zoom_in_weight=1.0, zoom_out_weight=0.0,
                           zoom_in_min=1.4, zoom_in_max=1.4)
    st = aug.sample_state(random.Random(1), allow_zoom_in=True)
    assert st.zoom_in_factor is not None
    out = aug.apply(w, st, random.Random(2))
    # the anchor GT (most recent labelled frame) must survive the crop
    assert out["label_mask"][2].any()


def test_psee_dat_roundtrip(tmp_path):
    from rvt_tpu.data.psee_loader import PSEELoader, write_dat

    rng = np.random.RandomState(0)
    n = 1000
    t = np.sort(rng.randint(0, 1_000_000, n))
    x = rng.randint(0, 304, n)
    y = rng.randint(0, 240, n)
    p = rng.randint(0, 2, n)
    path = tmp_path / "events_td.dat"
    write_dat(path, t, x, y, p, height=240, width=304)

    loader = PSEELoader(path)
    assert loader.event_count() == n
    assert loader.height == 240 and loader.width == 304
    ev = loader.load_n_events(n)
    np.testing.assert_array_equal(ev["x"], x)
    np.testing.assert_array_equal(ev["y"], y)
    np.testing.assert_array_equal(ev["p"], p)
    np.testing.assert_array_equal(ev["t"], t)
    # time-window loading
    loader.seek_event(0)
    first_100ms = loader.load_delta_t(100_000)
    expected = (t < t[0] + 100_000).sum()
    assert len(first_100ms["t"]) == expected


def test_visualization_smoke():
    from rvt_tpu.evaluation.prophesee import BBOX_DTYPE
    from rvt_tpu.utils.visualization import ev_repr_to_img, render_detections

    ev = np.zeros((20, 32, 48), np.uint8)
    ev[0, 5, 5] = 3   # negative-dominant pixel
    ev[10, 8, 8] = 3  # positive-dominant pixel
    img = ev_repr_to_img(ev)
    assert img.shape == (32, 48, 3)
    assert tuple(img[5, 5]) == (0, 0, 255)
    assert tuple(img[8, 8]) == (255, 0, 0)
    boxes = np.zeros(1, BBOX_DTYPE)
    boxes[0]["x"], boxes[0]["y"], boxes[0]["w"], boxes[0]["h"] = 4, 4, 10, 8
    out = render_detections(ev, boxes, boxes)
    assert out.shape == img.shape
