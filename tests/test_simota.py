"""SimOTA + loss equivalence vs the reference per-image torch loop.

The reference ``YOLOXHead.get_losses`` (yolo_head.py:291-443) is the hardest
parity risk (SURVEY.md §7): dynamic-k top-k, per-GT loops, boolean gathers.
We drive both implementations with identical random decoded predictions and
labels and require matching losses.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rvt_tpu.models.yolox import make_grids_and_strides  # noqa: E402
from rvt_tpu.training.losses import yolox_loss  # noqa: E402

from .reference_shim import install_shims  # noqa: E402

HW = [(32, 40), (16, 20), (8, 10)]  # gen1 256x320 feature levels
STRIDES = (8, 16, 32)
NUM_CLASSES = 2


def _build_ref_head():
    install_shims()
    from models.detection.yolox.models.yolo_head import YOLOXHead

    head = YOLOXHead(num_classes=NUM_CLASSES, strides=STRIDES,
                     in_channels=(64, 128, 256))
    head.train()
    return head


def _random_batch(seed, B=3, max_gt=7):
    rng = np.random.RandomState(seed)
    A = sum(h * w for h, w in HW)
    # plausible decoded predictions: centers in-frame, sizes log-normal
    xy = rng.uniform(0, [320, 256], size=(B, A, 2))
    wh = np.exp(rng.normal(2.5, 0.8, size=(B, A, 2)))
    obj = rng.normal(-2, 1, size=(B, A, 1))
    cls = rng.normal(-2, 1, size=(B, A, NUM_CLASSES))
    preds = np.concatenate([xy, wh, obj, cls], axis=-1).astype(np.float32)

    labels = np.zeros((B, max_gt, 5), np.float32)
    gt_mask = np.zeros((B, max_gt), bool)
    for b in range(B):
        n = rng.randint(0, max_gt + 1) if b > 0 else 0  # image 0: no GTs
        for m in range(n):
            w, h = rng.uniform(12, 90, 2)
            cx = rng.uniform(w / 2, 304 - w / 2)
            cy = rng.uniform(h / 2, 240 - h / 2)
            labels[b, m] = [rng.randint(0, NUM_CLASSES), cx, cy, w, h]
            gt_mask[b, m] = True
    return preds, labels, gt_mask


def _ref_losses(head, preds, labels):
    grid, stride = make_grids_and_strides(HW, STRIDES)
    x_shifts = [torch.from_numpy(grid[None, s: e, 0])
                for s, e in _level_slices()]
    y_shifts = [torch.from_numpy(grid[None, s: e, 1])
                for s, e in _level_slices()]
    expanded_strides = [torch.from_numpy(stride[None, s: e, 0])
                        for s, e in _level_slices()]
    out = head.get_losses(
        x_shifts, y_shifts, expanded_strides,
        torch.from_numpy(labels), torch.from_numpy(preds), [],
        dtype=torch.float32)
    keys = ("loss", "iou_loss", "conf_loss", "cls_loss", "l1_loss", "num_fg")
    return dict(zip(keys, [float(v) for v in out]))


def _level_slices():
    sizes = [h * w for h, w in HW]
    out, s = [], 0
    for sz in sizes:
        out.append((s, s + sz))
        s += sz
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_loss_equivalence(seed):
    head = _build_ref_head()
    preds, labels, gt_mask = _random_batch(seed)
    ref = _ref_losses(head, preds, labels)

    grid, stride = make_grids_and_strides(HW, STRIDES)
    ours = yolox_loss(jnp.asarray(preds), jnp.asarray(labels),
                      jnp.asarray(gt_mask),
                      jnp.ones(preds.shape[0], bool),
                      jnp.asarray(grid), jnp.asarray(stride[:, 0]),
                      NUM_CLASSES)
    for k in ("loss", "iou_loss", "conf_loss", "cls_loss", "num_fg"):
        np.testing.assert_allclose(float(ours[k]), ref[k], rtol=2e-4,
                                   atol=1e-5, err_msg=k)


def test_loss_padded_frames_are_ignored():
    """Appending invalid frames must not change the loss."""
    preds, labels, gt_mask = _random_batch(5)
    grid, stride = make_grids_and_strides(HW, STRIDES)
    args = (jnp.asarray(grid), jnp.asarray(stride[:, 0]), NUM_CLASSES)

    base = yolox_loss(jnp.asarray(preds), jnp.asarray(labels),
                      jnp.asarray(gt_mask), jnp.ones(preds.shape[0], bool), *args)

    pad = lambda x: jnp.concatenate([jnp.asarray(x), jnp.asarray(x[:1])], 0)
    frame_valid = jnp.array([True] * preds.shape[0] + [False])
    padded = yolox_loss(pad(preds), pad(labels), pad(gt_mask), frame_valid, *args)
    np.testing.assert_allclose(float(padded["loss"]), float(base["loss"]), rtol=1e-6)
