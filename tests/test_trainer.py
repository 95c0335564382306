"""Trainer orchestration: fit loop, metrics logging, orbax checkpoint
round-trip, prefetcher."""
import json

import numpy as np
import pytest

import jax

from rvt_tpu.config import preset
from rvt_tpu.data.prefetch import PrefetchIterator
from rvt_tpu.data.types import Batch
from rvt_tpu.training.trainer import Trainer, TrainerConfig


def _tiny_cfg():
    return preset("gen1", "tiny", resolution_hw=(32, 32), sequence_length=2,
                  max_labels_per_frame=4, max_labeled_frames=2)


def _batches(cfg, n, B=2, seed=0):
    rng = np.random.RandomState(seed)
    T = cfg.dataset.sequence_length
    H, W = cfg.dataset.dataloading_hw
    M = cfg.dataset.max_labels_per_frame
    for i in range(n):
        labels = np.zeros((B, T, M, 7), np.float32)
        label_mask = np.zeros((B, T, M), bool)
        labels[:, -1, 0] = (0, 8.0, 8.0, 12.0, 12.0, 0.0, 1.0)
        label_mask[:, -1, 0] = True
        yield Batch(
            ev_repr=rng.randint(0, 4, size=(B, T, H, W, 20)).astype(np.uint8),
            labels=labels, label_mask=label_mask,
            frame_valid=label_mask.any(-1),
            is_first_sample=np.full((B,), i == 0),
            is_padded=np.zeros((B, T), bool))


def test_trainer_fit_and_checkpoint(tmp_path):
    cfg = _tiny_cfg()
    tcfg = TrainerConfig(max_steps=3, log_every_n_steps=1,
                         ckpt_every_n_steps=2, ckpt_dir=str(tmp_path),
                         gradflow_every_n_steps=2)
    trainer = Trainer(cfg, tcfg, dp_size=1)
    metrics = trainer.fit(_batches(cfg, 5))
    assert "loss" in metrics and np.isfinite(metrics["loss"])
    assert int(jax.device_get(trainer.state.step)) == 3
    assert trainer._host_step == 3  # host counter mirrors the device step

    # metrics were logged as JSONL
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert len(lines) >= 3
    assert any("train/loss" in l for l in lines)
    # per-parameter gradient flow logged on its cadence (step 2), not others
    gf_lines = [l for l in lines
                if any(k.startswith("train/gradflow/") for k in l)]
    assert gf_lines and all(l["step"] == 2 for l in gf_lines)
    gf = gf_lines[0]
    vals = [v for k, v in gf.items() if k.startswith("train/gradflow/")]
    assert len(vals) > 20 and all(np.isfinite(v) and v >= 0 for v in vals)
    # weight magnitudes (logger.watch equivalent) on the same cadence
    wvals = [v for k, v in gf.items() if k.startswith("train/weights/")]
    assert len(wvals) > 20 and all(np.isfinite(v) and v >= 0 for v in wvals)
    assert not any(k.startswith("train/weights/")
                   for l in lines if l["step"] != 2 for k in l)

    # checkpoint written at step 2 and restorable
    trainer2 = Trainer(cfg, tcfg, dp_size=1)
    assert trainer2.restore()
    assert int(jax.device_get(trainer2.state.step)) == 2
    # restored params equal the saved ones (compare a leaf)
    p1 = jax.device_get(trainer2.state.params)
    leaves = jax.tree.leaves(p1)
    assert all(np.all(np.isfinite(x)) for x in leaves)


def test_trainer_train_detection_metrics(tmp_path):
    """Train-time detection metrics + train viz (reference
    detection_metrics_every_n_steps, modules/detection.py:199-205 +
    callbacks/detection.py:32-100): train/AP must appear in metrics.jsonl
    on the cadence and pred-vs-GT panels must be written."""
    from dataclasses import replace

    cfg = _tiny_cfg()
    # confidence 0: random-init logits otherwise yield zero detections
    cfg = replace(cfg, model=replace(
        cfg.model, postprocess=replace(cfg.model.postprocess,
                                       confidence_threshold=0.0)))
    tcfg = TrainerConfig(max_steps=4, log_every_n_steps=10,
                         ckpt_every_n_steps=100, ckpt_dir=str(tmp_path),
                         detection_metrics_every_n_steps=2,
                         detection_metrics_n_batches=2,
                         train_viz_dir=str(tmp_path / "viz"))

    def batches():
        # label time > the protocol's 0.5 s skip window so GT survives
        # filter_boxes (evaluation.py:22-38)
        for b in _batches(cfg, 5):
            b.labels[..., 0] = np.where(b.label_mask, 1_000_000.0, 0.0)
            yield b

    trainer = Trainer(cfg, tcfg, dp_size=1)
    metrics = trainer.fit(batches())
    assert np.isfinite(metrics.get("loss", np.nan)) or metrics == {}

    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    ap_lines = [l for l in lines if "train/AP" in l]
    assert ap_lines, "train/AP never logged"
    assert all(l["step"] % 2 == 0 for l in ap_lines)
    assert all(np.isfinite(l["train/AP"]) for l in ap_lines)

    pngs = sorted((tmp_path / "viz").glob("step_*.png"))
    assert pngs, "no train viz panel written"


def test_prefetch_iterator_order_and_error():
    cfg = _tiny_cfg()
    items = list(_batches(cfg, 7))
    out = list(PrefetchIterator(iter(items), prefetch_depth=3))
    assert len(out) == 7
    np.testing.assert_array_equal(out[0].ev_repr, items[0].ev_repr)
    np.testing.assert_array_equal(out[-1].ev_repr, items[-1].ev_repr)

    def failing():
        yield items[0]
        raise ValueError("boom")

    it = PrefetchIterator(failing())
    next(it)
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_best_checkpoint_survives_worse_steps(tmp_path):
    """Round-1 bug: recency-only retention deleted the best-AP checkpoint.
    A better-then-worse metric sequence must keep the best step restorable
    (reference ModelCheckpoint top-1 semantics, callbacks/custom.py:8-31)."""
    import jax.numpy as jnp

    from rvt_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ckpt", keep=2)
    mk = lambda v: {"w": jnp.full((4,), float(v))}
    mgr.save(mk(1), step=1, metric=0.3)
    mgr.save(mk(2), step=2, metric=0.5)   # best
    mgr.save(mk(3), step=3, metric=0.2)
    mgr.save(mk(4), step=4, metric=0.1)   # recency window is now {3, 4}
    assert mgr.best_step() == 2
    assert mgr.latest_step() == 4
    best = mgr.restore_best(mk(0))
    np.testing.assert_allclose(np.asarray(best["w"]), 2.0)
    latest = mgr.restore(mk(0))
    np.testing.assert_allclose(np.asarray(latest["w"]), 4.0)
    # best.json reflects the preserved step
    meta = json.loads((tmp_path / "ckpt" / "best.json").read_text())
    assert meta["step"] == 2 and meta["best"] == 0.5
    # a fresh manager on the same dir resumes the best-metric watermark
    mgr2 = CheckpointManager(tmp_path / "ckpt", keep=2)
    mgr2.save(mk(5), step=5, metric=0.4)  # worse than 0.5 -> best unchanged
    assert mgr2.best_step() == 2
