"""RVT detector: recurrent backbone + PAFPN + YOLOX head.

Equivalent to ``models/detection/yolox_extension/models/detector.py:18-72``
with the same backbone/detect split so the TBPTT loop can run the backbone
per timestep and the detection pass once over gathered features — but the
temporal loop is a ``jax.lax.scan`` with donated carry instead of a Python
loop (see ``scan_backbone``).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rvt_tpu.config import ModelConfig
from rvt_tpu.models.backbone import (BackboneFeatures, LstmStates, RVTBackbone,
                                     zero_states)
from rvt_tpu.models.yolox import YoloPAFPN, YoloXHead

Array = jax.Array


class RVTDetector(nn.Module):
    cfg: ModelConfig

    def setup(self):
        bb = self.cfg.backbone
        dtype = {"float32": None, "bfloat16": jnp.bfloat16}[self.cfg.compute_dtype]
        self.backbone = RVTBackbone(cfg=bb, dtype=dtype, name="backbone")
        in_stages = self.cfg.fpn.in_stages
        in_channels = tuple(bb.stage_dims[s - 1] for s in in_stages)
        strides = tuple(bb.strides[s - 1] for s in in_stages)
        self.fpn = YoloPAFPN(cfg=self.cfg.fpn, in_channels=in_channels,
                             dtype=dtype, name="fpn")
        self.head = YoloXHead(cfg=self.cfg.head, in_channels=in_channels,
                              strides=strides, dtype=dtype, name="head")

    def forward_backbone(self, x: Array, prev_states: LstmStates,
                         token_mask: Optional[Array] = None,
                         deterministic: bool = True) -> Tuple[BackboneFeatures, LstmStates]:
        return self.backbone(x, prev_states, token_mask, deterministic)

    def forward_detect(self, features: Sequence[Array], train: bool = False) -> Array:
        """features: stage maps at strides (8, 16, 32). Returns [B, A, 5+C]
        (decoded cxcywh + obj/cls logits)."""
        fpn_features = self.fpn(features, train)
        return self.head(fpn_features, train)

    def __call__(self, x: Array, prev_states: LstmStates,
                 token_mask: Optional[Array] = None,
                 train: bool = False) -> Tuple[Array, LstmStates]:
        """Single-timestep full forward (inference hot path)."""
        backbone_features, states = self.forward_backbone(
            x, prev_states, token_mask, deterministic=not train)
        feats = tuple(backbone_features[s] for s in self.cfg.fpn.in_stages)
        preds = self.forward_detect(feats, train)
        return preds, states


def init_detector(cfg: ModelConfig, rng: jax.Array, batch_size: int = 1,
                  dtype=jnp.float32) -> Tuple[RVTDetector, Any]:
    """Build the module and initialise variables with static shapes."""
    model = RVTDetector(cfg=cfg)
    x = jnp.zeros((batch_size,) + model_input_hw_c(cfg), dtype)
    states = zero_states(cfg.backbone, batch_size, dtype)
    variables = model.init(rng, x, states)
    return model, variables


def model_input_hw_c(cfg: ModelConfig) -> Tuple[int, int, int]:
    """Spatial+channel shape of one input frame (depends on stem_s2d)."""
    H, W = cfg.backbone.in_res_hw
    C = cfg.backbone.input_channels
    if cfg.backbone.stem_s2d:
        from rvt_tpu.ops.s2d import BLOCK, s2d_input_hw

        hp, wp = s2d_input_hw((H, W))
        return hp, wp, BLOCK * BLOCK * C
    return H, W, C


def scan_backbone(model: RVTDetector, variables, ev_seq: Array,
                  init_states: LstmStates, token_mask_seq: Optional[Array] = None,
                  deterministic: bool = True, remat: bool = True,
                  ) -> Tuple[Tuple[Array, ...], LstmStates]:
    """Run the recurrent backbone over a [T, B, H, W, C] window.

    Replaces the reference's Python TBPTT loop (modules/detection.py:131-158)
    with ``lax.scan``: one compiled step body, hidden states as donated
    carry. Only the FPN input stages are stacked over time to bound HBM use.

    Returns (features_per_stage, final_states) where features_per_stage is a
    tuple over ``cfg.fpn.in_stages`` of [T, B, h, w, c] arrays.
    """
    in_stages = model.cfg.fpn.in_stages

    def step(states, inp):
        x, tm = inp
        feats, new_states = model.apply(
            variables, x, states, tm, deterministic,
            method=RVTDetector.forward_backbone)
        return new_states, tuple(feats[s] for s in in_stages)

    if remat:
        step = jax.checkpoint(step)

    if token_mask_seq is None:
        token_mask_seq = jnp.zeros(
            ev_seq.shape[:2] + (ev_seq.shape[2] // model.cfg.backbone.stem_patch_size,
                                ev_seq.shape[3] // model.cfg.backbone.stem_patch_size),
            jnp.bool_) if model.cfg.backbone.enable_masking else None

    xs = (ev_seq, token_mask_seq) if token_mask_seq is not None else (ev_seq, None)
    if token_mask_seq is None:
        def step_no_mask(states, x):
            return step(states, (x, None))
        final_states, feats = jax.lax.scan(step_no_mask, init_states, ev_seq)
    else:
        final_states, feats = jax.lax.scan(step, init_states, xs)
    return feats, final_states
