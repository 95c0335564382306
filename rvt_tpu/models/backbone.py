"""Recurrent MaxViT backbone ("MaxViTRNN"), TPU-native.

Single-timestep forward equivalent to the reference
``models/detection/recurrent_backbone/maxvit_rnn.py:23-182``:
4 stages, each = strided-conv downsample -> N (window+grid) attention pairs
-> ConvLSTM; the per-stage hidden state h_t is both the stage output and the
skip feature for the FPN.

TPU-first deltas:
  * NHWC everywhere; no NCHW<->NHWC flips inside a stage,
  * states are an explicit pytree carried by a ``lax.scan`` outside this
    module (see models/detector.py) instead of Python-side stateful
    registries,
  * zero-state init is a pure function of static shapes.

The vestigial ``T_max_chrono_init`` option of the reference (parsed at
``maxvit_rnn.py:32`` but never used by the LSTM) is intentionally dropped.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rvt_tpu.config import BackboneConfig
from rvt_tpu.models.layers import ConvDownsample, DWSConvLSTM2d, MaxVitAttentionPair

Array = jax.Array
LstmState = Tuple[Array, Array]  # (h, c), each [B, H, W, C]
LstmStates = Tuple[LstmState, ...]
BackboneFeatures = Dict[int, Array]  # stage number (1-based) -> [B, H, W, C]


class RVTStage(nn.Module):
    """One backbone stage (maxvit_rnn.py:130-182)."""

    dim_out: int
    downsample_factor: int
    num_blocks: int
    enable_token_masking: bool
    cfg: BackboneConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, h_c: LstmState,
                 token_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Tuple[Array, LstmState]:
        is_stem = self.downsample_factor == self.cfg.stem_patch_size
        x = ConvDownsample(dim_out=self.dim_out,
                           downsample_factor=self.downsample_factor,
                           cfg=self.cfg.downsample, dtype=self.dtype,
                           s2d_input=self.cfg.stem_s2d and is_stem,
                           in_channels=self.cfg.input_channels,
                           name="downsample")(x)
        if self.enable_token_masking:
            mask_token = self.param("mask_token", nn.initializers.normal(stddev=0.02),
                                    (1, 1, 1, self.dim_out))
            if token_mask is not None:
                # token_mask: [B, H, W] bool at this stage's resolution
                x = jnp.where(token_mask[..., None], mask_token.astype(x.dtype), x)

        if self._whole_stage_fused(deterministic, x):
            return self._fused_stage_call(x, h_c)

        for i in range(self.num_blocks):
            # First block skips norm1 because the downsample output is
            # already layer-normed (maxvit_rnn.py:153).
            x = MaxVitAttentionPair(dim=self.dim_out, cfg=self.cfg.attention,
                                    skip_first_norm=(i == 0), dtype=self.dtype,
                                    fused=self.cfg.fused_kernels,
                                    name=f"block{i}")(x, deterministic)
        h, c = DWSConvLSTM2d(dim=self.dim_out, cfg=self.cfg.lstm,
                             dtype=self.dtype,
                             fused=self.cfg.fused_kernels,
                             name="lstm")(x, h_c, deterministic)
        return h, (h, c)

    def _whole_stage_fused(self, deterministic: bool, x: Array) -> bool:
        """Serve the whole stage (attention pair + ConvLSTM) as ONE Pallas
        kernel — the residual stream never round-trips HBM between the
        pair and the cell. Requires the single-block stage shape the
        shipped configs use and both sub-modules' fused envelopes."""
        from rvt_tpu.ops.fused_attention import stage_fusion_supported

        a, l = self.cfg.attention, self.cfg.lstm
        per_image = x.shape[1] * x.shape[2] * x.shape[3]
        return (self.cfg.fused_kernels and deterministic
                and not self.is_initializing()
                and self.dtype == jnp.bfloat16 and self.num_blocks == 1
                and not a.mlp_gated and a.attention_bias and a.mlp_bias
                and a.ls_init_value > 0 and a.drop_path == 0.0
                and a.drop_mlp == 0.0 and a.mlp_activation == "gelu"
                and not l.dws_conv and l.drop_cell_update == 0.0
                and stage_fusion_supported(per_image, self.dim_out))

    def _fused_stage_call(self, x: Array, h_c: LstmState
                          ) -> Tuple[Array, LstmState]:
        from rvt_tpu.ops.fused_attention import (attention_block_params,
                                                 fused_stage)

        p = self.variables["params"]
        C = self.dim_out
        lp = p["lstm"]["conv1x1"]
        h, c = fused_stage(
            x,
            attention_block_params(p["block0"]["att_window"], True),
            attention_block_params(p["block0"]["att_grid"], False),
            jnp.asarray(lp["kernel"], jnp.bfloat16).reshape(2 * C, 4 * C),
            jnp.asarray(lp["bias"], jnp.bfloat16).reshape(1, -1),
            h_c[0], h_c[1],
            heads=C // self.cfg.attention.dim_head,
            dim_head=self.cfg.attention.dim_head,
            part=tuple(self.cfg.attention.partition_size),
            skip_first_norm=True,
            eps=self.cfg.attention.norm_eps,
            interpret=jax.default_backend() == "cpu")
        return h, (h, c)


class RVTBackbone(nn.Module):
    """4-stage recurrent backbone; one timestep per call."""

    cfg: BackboneConfig
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.cfg
        assert cfg.num_stages == 4, "reference asserts 4 stages (maxvit_rnn.py:36)"
        stages = []
        for idx in range(cfg.num_stages):
            stages.append(RVTStage(
                dim_out=cfg.stage_dims[idx],
                downsample_factor=cfg.stem_patch_size if idx == 0 else 2,
                num_blocks=cfg.num_blocks[idx],
                enable_token_masking=cfg.enable_masking and idx == 0,
                cfg=cfg,
                dtype=self.dtype,
                name=f"stage{idx + 1}",
            ))
        self.stages = stages

    def __call__(self, x: Array, prev_states: LstmStates,
                 token_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Tuple[BackboneFeatures, LstmStates]:
        """x: [B, H, W, C_in] (uint8/float event tensor already padded).

        Returns ({1..4: h_t}, new_states). Mirrors maxvit_rnn.py:93-105.
        """
        states: List[LstmState] = []
        output: BackboneFeatures = {}
        for stage_idx, stage in enumerate(self.stages):
            x, state = stage(x, prev_states[stage_idx],
                             token_mask if stage_idx == 0 else None,
                             deterministic)
            states.append(state)
            output[stage_idx + 1] = x
        return output, tuple(states)


def zero_states(cfg: BackboneConfig, batch_size: int,
                dtype=jnp.float32) -> LstmStates:
    """Pure zero-state constructor (replaces the reference's lazy
    ``th.zeros_like`` init at rnn.py:43-47 with static shapes)."""
    H, W = cfg.in_res_hw
    states = []
    for stride, dim in zip(cfg.strides, cfg.stage_dims):
        shape = (batch_size, H // stride, W // stride, dim)
        states.append((jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)))
    return tuple(states)
