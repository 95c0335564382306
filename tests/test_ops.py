"""Unit tests for on-device ops: NMS semantics, voxelization vs the
reference torch representations, box conversions."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvt_tpu.ops.boxes import (cxcywh_to_xyxy, pairwise_iou_xyxy, postprocess,
                               xyxy_to_cxcywh)
from rvt_tpu.ops.voxelization import (mixed_density_stack,
                                      repair_time_monotonicity,
                                      stacked_histogram)


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------


def _numpy_batched_nms(boxes, scores, classes, iou_thr):
    """Oracle: torchvision batched_nms semantics (greedy, score order,
    suppress IoU > thr within same class)."""
    order = np.argsort(-scores, kind="mergesort")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            if classes[j] != classes[i]:
                continue
            # IoU
            x1 = max(boxes[i, 0], boxes[j, 0]); y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2]); y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (a + b - inter) if a + b - inter > 0 else 0.0
            # only later-ranked boxes can be suppressed
            if iou > iou_thr and scores[j] <= scores[i]:
                if list(order).index(j) > list(order).index(i):
                    suppressed[j] = True
    return keep


@pytest.mark.parametrize("seed", [0, 1])
def test_postprocess_matches_numpy_oracle(seed):
    rng = np.random.RandomState(seed)
    A, C = 120, 2
    # clustered boxes to force suppressions
    centers = rng.uniform(40, 260, size=(A, 2))
    centers[:60] = centers[:1] + rng.normal(0, 6, size=(60, 2))
    wh = rng.uniform(20, 60, size=(A, 2))
    obj = rng.uniform(0, 1, size=A)
    cls = rng.uniform(0, 1, size=(A, C))
    preds = np.concatenate([centers, wh, obj[:, None], cls], axis=1).astype(np.float32)

    dets, valid = postprocess(jnp.asarray(preds[None]), C, conf_thre=0.1,
                              nms_thre=0.45, pre_nms_topk=128,
                              max_detections=64)
    dets, valid = np.asarray(dets[0]), np.asarray(valid[0])

    # numpy oracle on the same candidate set
    boxes = np.asarray(cxcywh_to_xyxy(jnp.asarray(preds[:, :4])))
    class_conf = cls.max(1)
    class_id = cls.argmax(1)
    score = obj * class_conf
    sel = score >= 0.1
    idx = np.flatnonzero(sel)
    keep = _numpy_batched_nms(boxes[idx], score[idx], class_id[idx], 0.45)
    kept = idx[keep]
    order = np.argsort(-score[kept], kind="mergesort")
    kept = kept[order][:64]

    n = valid.sum()
    assert n == len(kept), (n, len(kept))
    np.testing.assert_allclose(dets[:n, :4], boxes[kept], rtol=1e-5)
    np.testing.assert_allclose(dets[:n, 4], obj[kept], rtol=1e-5)
    np.testing.assert_allclose(dets[:n, 6], class_id[kept])


def test_postprocess_dense_scene_all_anchors():
    """pre_nms_topk<=0 NMS-es every above-threshold box (reference
    semantics). A dense scene with more candidates than a small top-k
    would keep: the truncating knob clips real detections, the default
    (all anchors) keeps them all."""
    rng = np.random.RandomState(3)
    A, C = 96, 2
    # 96 well-separated high-confidence boxes: nothing suppresses anything
    gx, gy = np.meshgrid(np.arange(12), np.arange(8))
    centers = np.stack([40.0 * gx.ravel() + 20, 40.0 * gy.ravel() + 20], 1)
    wh = np.full((A, 2), 12.0)
    obj = rng.uniform(0.8, 1.0, size=A)
    cls = rng.uniform(0.8, 1.0, size=(A, C))
    preds = jnp.asarray(np.concatenate(
        [centers, wh, obj[:, None], cls], axis=1).astype(np.float32)[None])

    dets_all, valid_all = postprocess(preds, C, conf_thre=0.1, nms_thre=0.45,
                                      pre_nms_topk=0, max_detections=128)
    dets_k, valid_k = postprocess(preds, C, conf_thre=0.1, nms_thre=0.45,
                                  pre_nms_topk=32, max_detections=128)
    assert int(valid_all.sum()) == A  # nothing clipped
    assert int(valid_k.sum()) == 32  # the truncating knob clips 64 boxes


def test_box_conversions_roundtrip():
    rng = np.random.RandomState(0)
    b = rng.uniform(0, 100, size=(16, 4)).astype(np.float32)
    b[:, 2:] += 1.0
    out = np.asarray(xyxy_to_cxcywh(cxcywh_to_xyxy(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# Voxelization vs reference torch representations
# ---------------------------------------------------------------------------


def _random_events(rng, n, H, W, t_max=50000):
    x = rng.randint(0, W, n)
    y = rng.randint(0, H, n)
    p = rng.randint(0, 2, n)
    t = np.sort(rng.randint(0, t_max, n))
    return x, y, p, t


def test_stacked_histogram_matches_reference():
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference")
    from data.utils.representations import StackedHistogram

    rng = np.random.RandomState(0)
    H, W, bins = 24, 32, 10
    x, y, p, t = _random_events(rng, 5000, H, W)

    ref = StackedHistogram(bins=bins, height=H, width=W)
    expected = ref.construct(torch.from_numpy(x), torch.from_numpy(y),
                             torch.from_numpy(p), torch.from_numpy(t)).numpy()

    N = 8192  # padded static size
    pad = lambda a: np.pad(a, (0, N - len(a)))
    got = np.asarray(stacked_histogram(
        jnp.asarray(pad(x)), jnp.asarray(pad(y)), jnp.asarray(pad(p)),
        jnp.asarray(pad(t)), jnp.asarray(len(x)), bins, H, W))
    expected = expected.reshape(2 * bins, H, W)
    np.testing.assert_array_equal(got, expected)


def test_mixed_density_stack_matches_reference():
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference")
    from data.utils.representations import MixedDensityEventStack

    rng = np.random.RandomState(1)
    H, W, bins = 24, 32, 10
    x, y, p, t = _random_events(rng, 4000, H, W)

    ref = MixedDensityEventStack(bins=bins, height=H, width=W, count_cutoff=100)
    expected = ref.construct(torch.from_numpy(x), torch.from_numpy(y),
                             torch.from_numpy(p), torch.from_numpy(t)).numpy()

    N = 4096
    pad = lambda a: np.pad(a, (0, N - len(a)))
    got = np.asarray(mixed_density_stack(
        jnp.asarray(pad(x)), jnp.asarray(pad(y)), jnp.asarray(pad(p)),
        jnp.asarray(pad(t)), jnp.asarray(len(x)), bins, H, W,
        count_cutoff=100))
    np.testing.assert_array_equal(got, expected)


def test_empty_event_window():
    z = jnp.zeros((128,), jnp.int32)
    got = np.asarray(stacked_histogram(z, z, z, z, jnp.asarray(0), 10, 8, 16))
    assert got.shape == (20, 8, 16)
    assert got.sum() == 0


def test_repair_time_monotonicity():
    t = jnp.asarray(np.array([0, 5, 3, 7, 6, 6, 10]))
    out = np.asarray(repair_time_monotonicity(t))
    np.testing.assert_array_equal(out, [0, 5, 5, 7, 7, 7, 10])


def test_pairwise_iou():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = np.asarray(pairwise_iou_xyxy(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], rtol=1e-6)


def test_stacked_histogram_pallas_interpret_matches_jax():
    """Pallas voxelizer (interpret mode on CPU) == XLA scatter version."""
    import jax.numpy as jnp

    from rvt_tpu.ops.voxelization import (stacked_histogram,
                                          stacked_histogram_pallas)

    rng = np.random.RandomState(2)
    H, W, bins, n = 16, 24, 4, 3000
    N = 4096
    x = rng.randint(0, W, n)
    y = rng.randint(0, H, n)
    p = rng.randint(0, 2, n)
    t = np.sort(rng.randint(0, 50000, n))
    pad = lambda a: jnp.asarray(np.pad(a, (0, N - n)))
    args = (pad(x), pad(y), pad(p), pad(t), jnp.asarray(n), bins, H, W)
    ref = np.asarray(stacked_histogram(*args))
    got = np.asarray(stacked_histogram_pallas(*args, chunk=1024,
                                              interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_stacked_histogram_pallas_multitile_clustered():
    """Multi-row-tile geometry with pathologically clustered events: covers
    the kernel's chunk-clamp masking (tile event range not 128-aligned,
    range longer than one chunk) and empty tiles. Run on the real chip via
    tools/verify_tpu_kernels.py; interpret mode here."""
    from rvt_tpu.ops.voxelization import (stacked_histogram,
                                          stacked_histogram_pallas_batched)

    rng = np.random.RandomState(7)
    H, W, bins = 96, 24, 2  # 2*2*96 = 384 rows -> 3 row tiles
    B, N = 2, 2048
    # lane 0: all events on one pixel (single tile gets every event);
    # lane 1: uniform with a short valid prefix.
    x = rng.randint(0, W, (B, N)).astype(np.int32)
    y = rng.randint(0, H, (B, N)).astype(np.int32)
    x[0], y[0] = 5, 17
    p = rng.randint(0, 2, (B, N)).astype(np.int32)
    t = np.sort(rng.randint(0, 50000, (B, N)), axis=1).astype(np.int32)
    counts = np.asarray([N, 801], np.int32)

    args = tuple(jnp.asarray(a) for a in (x, y, p, t, counts))
    ref = np.asarray(jax.vmap(
        lambda xi, yi, pi, ti, n: stacked_histogram(xi, yi, pi, ti, n,
                                                    bins, H, W))(*args))
    got = np.asarray(stacked_histogram_pallas_batched(
        *args, bins=bins, height=H, width=W, chunk=1024, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_voxelizer_drops_out_of_range():
    """Pins the documented contract divergence on unsanitized input: the
    Pallas path DROPS out-of-range x/y/pol events, while the XLA scatter
    oracle row-aliases x overflow (x + width*y wraps into the next row).
    The Pallas output must equal the oracle run on the sanitized subset."""
    from rvt_tpu.ops.voxelization import (stacked_histogram,
                                          stacked_histogram_pallas_batched)

    rng = np.random.RandomState(11)
    H, W, bins, N = 16, 24, 4, 512
    n = 300
    x = rng.randint(0, W, (1, N)).astype(np.int32)
    y = rng.randint(0, H, (1, N)).astype(np.int32)
    p = rng.randint(0, 2, (1, N)).astype(np.int32)
    t = np.sort(rng.randint(0, 50000, (1, N)), axis=1).astype(np.int32)
    # inject out-of-range coordinates among the valid prefix
    bad = rng.choice(n, 40, replace=False)
    x[0, bad[:10]] = W + rng.randint(0, 5, 10)
    x[0, bad[10:15]] = -1
    y[0, bad[15:25]] = H + rng.randint(0, 3, 10)
    y[0, bad[25:30]] = -2
    p[0, bad[30:]] = 2

    args = tuple(jnp.asarray(a) for a in (x, y, p, t,
                                          np.asarray([n], np.int32)))
    got = np.asarray(stacked_histogram_pallas_batched(
        *args, bins=bins, height=H, width=W, chunk=512, interpret=True))[0]

    # oracle on the sanitized subset, same time-bin normalisation as the
    # full stream (bins are computed before dropping)
    ok = ((x[0, :n] >= 0) & (x[0, :n] < W) & (y[0, :n] >= 0)
          & (y[0, :n] < H) & (p[0, :n] >= 0) & (p[0, :n] <= 1))
    from rvt_tpu.ops.voxelization import _time_bin_indices
    t_idx = np.asarray(_time_bin_indices(jnp.asarray(t[0]),
                                         jnp.asarray(n), bins))[:n]
    ref = np.zeros((2 * bins, H, W), np.int64)
    for i in np.flatnonzero(ok):
        ref[p[0, i] * bins + t_idx[i], y[0, i], x[0, i]] += 1
    np.testing.assert_array_equal(got, np.minimum(ref, 255).astype(np.uint8))


def test_raw_inference_pipeline():
    """Raw events -> voxelize -> detector -> NMS, one jit region (CPU,
    interpret-mode Pallas, tiny geometry)."""
    from rvt_tpu.config import preset
    from rvt_tpu.inference import make_raw_inference_step
    from rvt_tpu.models import init_detector, zero_states

    cfg = preset("gen1", "tiny", resolution_hw=(32, 48), sequence_length=2,
                 max_labels_per_frame=4)
    model, variables = init_detector(cfg.model, jax.random.PRNGKey(0),
                                     batch_size=2)
    step = make_raw_inference_step(model, cfg, use_pallas_voxelizer=True,
                                   interpret=True)

    rng = np.random.RandomState(0)
    B, N = 2, 1024
    n = np.array([700, 500], np.int32)
    x = np.zeros((B, N), np.int32)
    y = np.zeros((B, N), np.int32)
    p = np.zeros((B, N), np.int32)
    t = np.zeros((B, N), np.int32)
    for b in range(B):
        x[b, :n[b]] = rng.randint(0, 48, n[b])
        y[b, :n[b]] = rng.randint(0, 32, n[b])
        p[b, :n[b]] = rng.randint(0, 2, n[b])
        t[b, :n[b]] = np.sort(rng.randint(0, 50000, n[b]))
    states = zero_states(cfg.model.backbone, B)
    states, dets, valid = step(variables, states,
                               jnp.asarray(x), jnp.asarray(y), jnp.asarray(p),
                               jnp.asarray(t), jnp.asarray(n),
                               jnp.ones((B,), bool))
    assert dets.shape[0] == B and dets.shape[-1] == 7
    assert np.isfinite(np.asarray(dets)).all()
    # recurrence: second call with carried state still works
    states, dets2, _ = step(variables, states,
                            jnp.asarray(x), jnp.asarray(y), jnp.asarray(p),
                            jnp.asarray(t), jnp.asarray(n),
                            jnp.zeros((B,), bool))
    assert np.isfinite(np.asarray(dets2)).all()


def test_ds2_direct_voxelization_bit_exact():
    """gen4 ds2 shortcut: voxelize odd-coordinate events straight into the
    half-res grid == full-res voxelize then nearest-exact downsample
    (src = 2*dst+1, preprocess_dataset.py:467-477). Bit-exact by
    construction: time-bin normalization sees the same t/counts, and the
    count cutoff is per-pixel either way."""
    from rvt_tpu.ops.voxelization import (stacked_histogram,
                                          stacked_histogram_pallas_batched)

    rng = np.random.RandomState(3)
    bins, H, W = 4, 24, 32
    B, N = 2, 2048
    n = np.array([1800, 900], np.int32)
    x = np.zeros((B, N), np.int32)
    y = np.zeros((B, N), np.int32)
    p = np.zeros((B, N), np.int32)
    t = np.zeros((B, N), np.int32)
    for b in range(B):
        x[b, :n[b]] = rng.randint(0, W, n[b])
        y[b, :n[b]] = rng.randint(0, H, n[b])
        p[b, :n[b]] = rng.randint(0, 2, n[b])
        t[b, :n[b]] = np.sort(rng.randint(0, 50_000, n[b]))
    args = tuple(jnp.asarray(a) for a in (x, y, p, t, n))

    full = jax.vmap(lambda xi, yi, pi, ti, c: stacked_histogram(
        xi, yi, pi, ti, c, bins, H, W))(*args)
    expected = np.asarray(full)[..., 1::2, 1::2]

    odd = (x % 2 == 1) & (y % 2 == 1)
    vH, vW = H // 2, W // 2
    x2 = jnp.asarray(np.where(odd, x // 2, 2 * bins * vH * vW), jnp.int32)
    y2 = jnp.asarray(np.where(odd, y // 2, vH), jnp.int32)
    half_xla = jax.vmap(lambda xi, yi, pi, ti, c: stacked_histogram(
        xi, yi, pi, ti, c, bins, vH, vW))(x2, y2, args[2], args[3], args[4])
    np.testing.assert_array_equal(np.asarray(half_xla), expected)

    half_pl = stacked_histogram_pallas_batched(
        x2, y2, args[2], args[3], args[4], bins, vH, vW, chunk=512,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(half_pl), expected)


def test_raw_inference_ds2_direct_matches_downsample_path():
    """End-to-end gen4-style raw step: ds2_direct=True detections ==
    ds2_direct=False (voxelize full, then downsample) on the same inputs."""
    from dataclasses import replace as dc_replace

    from rvt_tpu.config import preset
    from rvt_tpu.inference import make_raw_inference_step
    from rvt_tpu.models import init_detector, zero_states

    cfg = preset("gen4", "tiny", resolution_hw=(48, 64), sequence_length=2,
                 max_labels_per_frame=4)
    assert cfg.dataset.downsample_by_factor_2
    model, variables = init_detector(cfg.model, jax.random.PRNGKey(0),
                                     batch_size=1)
    rng = np.random.RandomState(1)
    B, N = 1, 1024
    n = np.array([900], np.int32)
    x = np.zeros((B, N), np.int32)
    y = np.zeros((B, N), np.int32)
    p = np.zeros((B, N), np.int32)
    t = np.zeros((B, N), np.int32)
    x[0, :n[0]] = rng.randint(0, 64, n[0])
    y[0, :n[0]] = rng.randint(0, 48, n[0])
    p[0, :n[0]] = rng.randint(0, 2, n[0])
    t[0, :n[0]] = np.sort(rng.randint(0, 50_000, n[0]))
    inputs = tuple(jnp.asarray(a) for a in (x, y, p, t, n))

    outs = []
    for direct in (True, False):
        step = make_raw_inference_step(model, cfg, use_pallas_voxelizer=True,
                                       interpret=True, ds2_direct=direct)
        states = zero_states(cfg.model.backbone, B)
        _, dets, valid = step(variables, states, *inputs,
                              jnp.ones((B,), bool))
        outs.append((np.asarray(dets), np.asarray(valid)))
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
