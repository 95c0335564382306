"""The one-command mAP gate harness (tools/run_gate.py) must execute the
full chain today — convert a real reference torch checkpoint, stream-eval
it, produce Prophesee COCO stats and the gate verdict — on the synthetic
fixture dataset. Only the real datasets/checkpoints are missing inputs.
"""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
torch = pytest.importorskip("torch")

import jax  # noqa: E402

from rvt_tpu.config import preset  # noqa: E402

from .reference_shim import build_reference_detector  # noqa: E402
from .test_eval_loop import make_mini_gen1_dataset  # noqa: E402

PRESET_KW = dict(resolution_hw=(64, 80), sequence_length=5,
                 max_labels_per_frame=8, max_labeled_frames=4)


def test_run_gate_end_to_end(tmp_path):
    from tools.run_gate import PAPER_MAP, run_gate

    data = make_mini_gen1_dataset(tmp_path, names=("a",))

    # a genuine reference checkpoint file (random init) in Lightning layout
    ref = build_reference_detector(preset("gen1", "tiny", **PRESET_KW), seed=0)
    ckpt = tmp_path / "rvt-t.ckpt"
    torch.save({"state_dict": {f"mdl.{k}": v
                               for k, v in ref.state_dict().items()}},
               str(ckpt))

    # skip_md5: this is intentionally a synthetic (random-init) ckpt that
    # borrows the published rvt-t name; the md5 guard would reject it
    record = run_gate(ckpt, data.parent, "gen1", "tiny", split="val",
                      batch_size=1, expected_map=0.0,
                      preset_kwargs=PRESET_KW, skip_md5=True)
    for k in ("AP", "AP_50", "AP_75", "AP_S", "AP_M", "AP_L"):
        assert k in record and np.isfinite(record[k])
    # random weights -> no confident detections -> AP 0 == expected 0
    assert record["gate_pass"] is True
    assert record["delta_vs_expected"] <= 0.2
    assert record["num_recordings"] == 1
    assert record["paper_map"] == PAPER_MAP[("gen1", "tiny")]
    assert "delta_vs_paper" in record


def test_size_inference_from_ckpt_name():
    """rvt-{t,s,b}.ckpt names map to tiny/small/base (README.md:73-108)."""
    from tools.run_gate import PAPER_MAP

    for stem, size in (("rvt-t", "tiny"), ("rvt-s", "small"),
                       ("rvt-b", "base")):
        short = stem.rsplit("-", 1)[-1][:1]
        mapped = {"t": "tiny", "s": "small", "b": "base"}[short]
        assert mapped == size
        assert ("gen1", size) in PAPER_MAP and ("gen4", size) in PAPER_MAP


def test_run_gate_serve_fused(tmp_path):
    """The gate also runs on the bf16 fused-kernel serving path (the
    production config quantified against the f32 default)."""
    from tools.run_gate import run_gate

    data = make_mini_gen1_dataset(tmp_path, names=("a",))
    ref = build_reference_detector(preset("gen1", "tiny", **PRESET_KW), seed=0)
    ckpt = tmp_path / "rvt-t.ckpt"
    torch.save({"state_dict": {f"mdl.{k}": v
                               for k, v in ref.state_dict().items()}},
               str(ckpt))
    record = run_gate(ckpt, data.parent, "gen1", "tiny", split="val",
                      batch_size=1, expected_map=0.0, skip_md5=True,
                      preset_kwargs=PRESET_KW, serve_fused=True)
    assert record["serve_fused"] is True
    assert record["gate_pass"] is True
