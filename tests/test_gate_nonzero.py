"""Discriminative end-to-end gate: fit the tiny model on a LEARNABLE
synthetic fixture until it actually detects, then assert a nonzero AP
through the full chain (model -> NMS -> structured buffers -> Prophesee
COCO) and that the bf16 fused-kernel serving path reproduces the f32 XLA
path's AP (round-2 VERDICT #5: the previous gate tests only proved the
zero case — a chain that silently returned no detections everywhere
would have passed).

The fixture has real signal: events cluster inside a box that drifts
sinusoidally, so the detector must learn "dense events here -> box
here" (measured trajectory: AP50 ~0.03 at step 400, ~0.17 at 500,
~0.67 at 600 with lr 1e-3).

~15 min of training on this 1-core host -> marked slow (the round driver
runs `-m slow` full-resolution parity separately; run with
`pytest -m slow tests/test_gate_nonzero.py`).
"""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax  # noqa: E402

from rvt_tpu.config import preset  # noqa: E402

HW = (64, 80)
STEPS = 600


def make_learnable_dataset(root, names=("a", "b"), hw=HW):
    """Recordings whose events cluster inside a moving box (80% inside,
    20% uniform noise), labels at 4 Hz. Uses the real preprocessing CLI so
    the on-disk format is the production one."""
    from rvt_tpu.cli import preprocess as pp

    from .test_data_pipeline import BBOX_DTYPE

    H, W = hw
    old = pp.DATASET_HW["gen1"]
    pp.DATASET_HW["gen1"] = (H, W)
    try:
        for i, name in enumerate(names):
            raw = root / "raw"
            raw.mkdir(exist_ok=True, parents=True)
            rng = np.random.RandomState(100 + i)
            dur = 2_500_000
            n_events = 120_000
            t = np.sort(rng.randint(0, dur, n_events)).astype(np.int64)
            bw, bh = 30.0, 24.0

            def box_at(ts):
                ph = 2 * np.pi * ts / dur
                cx = W / 2 + (W / 2 - bw / 2 - 4) * np.sin(ph + i)
                cy = H / 2 + (H / 2 - bh / 2 - 4) * np.sin(2 * ph + i)
                return cx, cy

            cx, cy = box_at(t.astype(np.float64))
            inside = rng.rand(n_events) < 0.8
            x = np.where(inside,
                         np.clip(cx + rng.uniform(-bw / 2, bw / 2, n_events),
                                 0, W - 1),
                         rng.randint(0, W, n_events)).astype(np.uint16)
            y = np.where(inside,
                         np.clip(cy + rng.uniform(-bh / 2, bh / 2, n_events),
                                 0, H - 1),
                         rng.randint(0, H, n_events)).astype(np.uint16)
            p = rng.randint(0, 2, n_events).astype(np.int8)
            h5f = raw / f"{name}_td.dat.h5"
            with h5py.File(str(h5f), "w") as f:
                g = f.create_group("events")
                for k, v in (("x", x), ("y", y), ("p", p), ("t", t)):
                    g.create_dataset(k, data=v)
                g.create_dataset("height", data=H)
                g.create_dataset("width", data=W)
            label_ts = np.arange(600_000, dur, 250_000, dtype=np.int64)
            rows = []
            for ts in label_ts:
                bcx, bcy = box_at(float(ts))
                rows.append((ts, bcx - bw / 2, bcy - bh / 2, bw, bh,
                             0, 0, 1.0))
            np.save(str(raw / f"{name}_bbox.npy"),
                    np.array(rows, dtype=BBOX_DTYPE))
            assert pp.process_recording(raw / f"{name}_bbox.npy", h5f,
                                        root / "val" / name, "gen1", "val")
    finally:
        pp.DATASET_HW["gen1"] = old
    return root / "val"


@pytest.mark.slow
def test_trained_model_scores_nonzero_ap_and_fused_parity(tmp_path):
    from dataclasses import replace

    from rvt_tpu.data.sequence import Recording, StreamView
    from rvt_tpu.data.streaming import (EvalStreamScheduler,
                                        TrainStreamScheduler)
    from rvt_tpu.models import RVTDetector
    from rvt_tpu.training.evaluator_loop import run_streaming_eval
    from rvt_tpu.training.trainer import Trainer, TrainerConfig

    data = make_learnable_dataset(tmp_path)
    cfg = preset("gen1", "tiny", resolution_hw=HW, sequence_length=5,
                 max_labels_per_frame=8, max_labeled_frames=4)
    cfg = replace(cfg, training=replace(cfg.training, learning_rate=1e-3,
                                        max_steps=STEPS))

    recs = [Recording(p, cfg.dataset.ev_repr_name, original_hw=HW,
                      max_labels_per_frame=8)
            for p in sorted(data.iterdir())]
    streams = []
    for r in recs:
        streams.extend(StreamView.with_guaranteed_labels(
            r, cfg.dataset.sequence_length))
    sched = TrainStreamScheduler(streams, 4, seed=0)

    tcfg = TrainerConfig(max_steps=STEPS, log_every_n_steps=STEPS,
                         ckpt_every_n_steps=10 ** 9,
                         ckpt_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, tcfg, dp_size=1)
    metrics = trainer.fit(iter(sched))
    assert np.isfinite(metrics["loss"])

    variables = {"params": jax.device_get(trainer.state.params),
                 "batch_stats": jax.device_get(trainer.state.batch_stats)}

    def evaluate(eval_cfg):
        model = RVTDetector(cfg=eval_cfg.model)
        views = [StreamView(r, eval_cfg.dataset.sequence_length)
                 for r in recs]
        return run_streaming_eval(
            model, variables, eval_cfg,
            iter(EvalStreamScheduler(views, batch_size=2)), batch_size=2)

    # 1) f32 XLA path: the full chain must produce a clearly nonzero AP
    m_xla = evaluate(cfg)
    assert m_xla is not None
    assert m_xla["AP_50"] > 0.3, m_xla
    assert m_xla["AP"] > 0.05, m_xla

    # 2) bf16 fused-kernel serving path reproduces it within the gate
    #    budget (VERDICT criterion: 0.2 AP on this fixture)
    cfg_f = replace(cfg, model=replace(
        cfg.model, compute_dtype="bfloat16",
        backbone=replace(cfg.model.backbone, fused_kernels=True)))
    m_fused = evaluate(cfg_f)
    assert m_fused is not None
    assert abs(m_fused["AP"] - m_xla["AP"]) <= 0.2, (m_fused, m_xla)
    assert m_fused["AP_50"] > 0.2, m_fused
