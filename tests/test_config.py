"""Config derive step + preset geometry (mirror of config/modifier.py)."""
import pytest

from rvt_tpu.config import preset
from rvt_tpu.registry import dataset_preset


def test_gen1_geometry():
    cfg = preset("gen1", "base")
    bb = cfg.model.backbone
    assert bb.in_res_hw == (256, 320)          # 240x304 padded to x32
    assert bb.attention.partition_size == (8, 10)
    assert cfg.model.head.num_classes == 2
    assert bb.stage_dims == (64, 128, 256, 512)
    assert bb.strides == (4, 8, 16, 32)
    assert cfg.dataset.sequence_length == 21
    assert cfg.training.learning_rate == 2e-4


def test_gen4_geometry():
    cfg = preset("gen4", "base")
    bb = cfg.model.backbone
    # 720x1280 ds2 -> 360x640 padded to multiple of 64 (partition_split 2)
    assert cfg.dataset.dataloading_hw == (360, 640)
    assert bb.in_res_hw == (384, 640)
    assert bb.attention.partition_size == (6, 10)
    assert cfg.model.head.num_classes == 3
    assert cfg.dataset.sequence_length == 5
    assert cfg.training.learning_rate == pytest.approx(3.46e-4)
    assert cfg.batch_size.train == 12


def test_size_presets():
    tiny = preset("gen1", "tiny")
    small = preset("gen1", "small")
    base = preset("gen1", "base")
    assert tiny.model.backbone.embed_dim == 32
    assert small.model.backbone.embed_dim == 48
    assert small.model.backbone.attention.dim_head == 24
    assert base.model.backbone.embed_dim == 64
    assert tiny.model.fpn.depth == 0.33 and base.model.fpn.depth == 0.67


def test_registry():
    cfg = dataset_preset("gen1", "tiny")
    assert cfg.model.head.num_classes == 2
    with pytest.raises(NotImplementedError):
        dataset_preset("kitti")


def test_custom_resolution_derive():
    cfg = preset("gen1", "tiny", resolution_hw=(100, 130))
    assert cfg.model.backbone.in_res_hw == (128, 160)
    assert cfg.model.backbone.attention.partition_size == (4, 5)


def test_max_labeled_frames_clamped_to_sequence_length():
    """A T-frame window cannot hold more than T labeled frames; derive()
    must clamp the static gather budget (gather_labeled_frames would
    otherwise build an invalid top-k shape)."""
    from dataclasses import replace

    from rvt_tpu.config import derive, preset

    cfg = preset("gen4", "base")
    # presets size the budget to the label cadence (10 Hz / 20 Hz -> 3+1)
    assert cfg.dataset.max_labeled_frames == 4
    assert cfg.dataset.max_labeled_frames <= cfg.dataset.sequence_length
    # and derive() clamps an oversized explicit setting
    over = replace(cfg, dataset=replace(cfg.dataset, max_labeled_frames=9))
    assert derive(over).dataset.max_labeled_frames == 5
    cfg = preset("gen1", "base")
    assert cfg.dataset.max_labeled_frames == 6  # 4 Hz cadence: 5 + margin
