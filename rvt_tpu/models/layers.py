"""Core MaxViT-RNN building blocks, TPU-native (flax.linen, NHWC).

Functionally equivalent to the reference blocks in
``/root/reference/models/layers/maxvit/maxvit.py`` and
``/root/reference/models/layers/rnn.py`` but designed for XLA:TPU:

  * channels-last (NHWC) everywhere — the native TPU conv layout; the
    reference flips between NCHW and NHWC per stage,
  * window/grid partitioning are pure reshapes/transposes that XLA fuses
    into the attention einsums,
  * all attention math runs through the MXU via einsum with
    ``preferred_element_type=float32``,
  * no in-place ops, no data-dependent control flow.

Numerical parity notes (checked against the reference):
  * LayerNorm eps = 1e-5 both in the downsample norm (``maxvit.py:172``)
    and the attention norms (``maxvit.py:201,229``),
  * GELU is the exact erf formulation (torch ``nn.GELU`` default),
  * gated MLP (GLU) uses inner_dim = floor(dim*ratio*2/3/32)*32
    (``maxvit.py:102``),
  * LSTM gate order is (forget, input, output, cell-update)
    (``rnn.py:57-66``).
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rvt_tpu.config import AttentionConfig, DownsampleConfig, LstmConfig

Array = jax.Array


def _act(name: str) -> Callable[[Array], Array]:
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name in ("silu", "swish"):
        return jax.nn.silu
    if name == "relu":
        return jax.nn.relu
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    raise NotImplementedError(name)


# ---------------------------------------------------------------------------
# Partitioning (maxvit.py:273-304) — pure layout transforms
# ---------------------------------------------------------------------------


def window_partition(x: Array, window_size: Tuple[int, int]) -> Array:
    """[B,H,W,C] -> [B * H/wh * W/ww, wh*ww, C] (non-overlapping blocks)."""
    B, H, W, C = x.shape
    wh, ww = window_size
    assert H % wh == 0 and W % ww == 0, (H, W, window_size)
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, C)


def window_reverse(windows: Array, window_size: Tuple[int, int], img_size: Tuple[int, int]) -> Array:
    H, W = img_size
    wh, ww = window_size
    C = windows.shape[-1]
    x = windows.reshape(-1, H // wh, W // ww, wh, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, H, W, C)


def grid_partition(x: Array, grid_size: Tuple[int, int]) -> Array:
    """[B,H,W,C] -> [B * H/gh * W/gw, gh*gw, C] (dilated sampling grid)."""
    B, H, W, C = x.shape
    gh, gw = grid_size
    assert H % gh == 0 and W % gw == 0, (H, W, grid_size)
    x = x.reshape(B, gh, H // gh, gw, W // gw, C)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(-1, gh * gw, C)


def grid_reverse(windows: Array, grid_size: Tuple[int, int], img_size: Tuple[int, int]) -> Array:
    H, W = img_size
    gh, gw = grid_size
    C = windows.shape[-1]
    x = windows.reshape(-1, H // gh, W // gw, gh, gw, C)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(-1, H, W, C)


# ---------------------------------------------------------------------------
# Attention / MLP / LayerScale
# ---------------------------------------------------------------------------


class LayerScale(nn.Module):
    """Per-channel learnable residual scale (maxvit.py:45-53)."""

    dim: int
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param("gamma", nn.initializers.constant(self.init_value), (self.dim,))
        return x * gamma


class SelfAttentionCl(nn.Module):
    """Channels-last MHSA over the token axis (maxvit.py:328-354).

    The packed qkv projection keeps the reference's per-head interleaved
    layout: output reshaped to (..., heads, 3*dim_head) then split, so a
    converted torch checkpoint maps weight-for-weight.
    """

    dim: int
    dim_head: int = 32
    bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        num_heads = self.dim // self.dim_head
        B, N, C = x.shape
        qkv = nn.Dense(self.dim * 3, use_bias=self.bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, num_heads, 3 * self.dim_head)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each [B, N, h, dh]
        scale = self.dim_head ** -0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * scale, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v, preferred_element_type=jnp.float32)
        out = out.astype(qkv.dtype).reshape(B, N, C)
        return nn.Dense(self.dim, use_bias=self.bias, dtype=self.dtype,
                        name="proj")(out)


class GLU(nn.Module):
    """Gated linear unit (maxvit.py:56-82)."""

    dim_out: int
    act: str
    bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        proj = nn.Dense(self.dim_out * 2, use_bias=self.bias,
                        dtype=self.dtype, name="proj")(x)
        val, gate = jnp.split(proj, 2, axis=-1)
        return val * _act(self.act)(gate)


class MLP(nn.Module):
    """Transformer FFN, optionally gated (maxvit.py:85-118)."""

    dim: int
    expansion_ratio: int
    act: str
    gated: bool
    bias: bool = True
    drop_prob: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        inner_dim = int(self.dim * self.expansion_ratio)
        if self.gated:
            inner_dim = math.floor(inner_dim * 2 / 3 / 32) * 32  # maxvit.py:102
            x = GLU(dim_out=inner_dim, act=self.act, bias=self.bias,
                    dtype=self.dtype, name="glu")(x)
        else:
            x = nn.Dense(inner_dim, use_bias=self.bias, dtype=self.dtype,
                         name="fc1")(x)
            x = _act(self.act)(x)
        if self.drop_prob > 0.0:
            x = nn.Dropout(rate=self.drop_prob)(x, deterministic=deterministic)
        return nn.Dense(self.dim, use_bias=self.bias, dtype=self.dtype,
                        name="fc2")(x)


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath). Off in shipped configs."""

    rate: float

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x * mask / keep


class PartitionAttention(nn.Module):
    """LN -> partition -> MHSA -> reverse -> LS -> residual; LN -> MLP -> LS
    -> residual (maxvit.py:185-270). ``partition_window=False`` = grid."""

    dim: int
    partition_window: bool
    cfg: AttentionConfig
    skip_first_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        cfg = self.cfg
        P = tuple(cfg.partition_size)
        img_size = x.shape[1:3]

        shortcut = x
        if not self.skip_first_norm:
            x = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=self.dtype,
                             name="norm1")(x)
        if self.partition_window:
            part = window_partition(x, P)
        else:
            part = grid_partition(x, P)
        part = SelfAttentionCl(dim=self.dim, dim_head=cfg.dim_head,
                               bias=cfg.attention_bias, dtype=self.dtype,
                               name="self_attn")(part)
        if self.partition_window:
            x = window_reverse(part, P, img_size)
        else:
            x = grid_reverse(part, P, img_size)
        if cfg.ls_init_value > 0:
            x = LayerScale(dim=self.dim, init_value=cfg.ls_init_value, name="ls1")(x)
        x = DropPath(rate=cfg.drop_path, name="drop_path1")(x, deterministic)
        x = shortcut + x

        shortcut = x
        y = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=self.dtype,
                         name="norm2")(x)
        y = MLP(dim=self.dim, expansion_ratio=cfg.mlp_ratio, act=cfg.mlp_activation,
                gated=cfg.mlp_gated, bias=cfg.mlp_bias, drop_prob=cfg.drop_mlp,
                dtype=self.dtype, name="mlp")(y, deterministic)
        if cfg.ls_init_value > 0:
            y = LayerScale(dim=self.dim, init_value=cfg.ls_init_value, name="ls2")(y)
        y = DropPath(rate=cfg.drop_path, name="drop_path2")(y, deterministic)
        return shortcut + y


class MaxVitAttentionPair(nn.Module):
    """Window attention followed by grid attention (maxvit_rnn.py:108-127).

    With ``fused=True`` (serving) the whole pair runs as one Pallas kernel
    per image (rvt_tpu/ops/fused_attention.py) — same math, every
    intermediate VMEM-resident. The XLA path below remains the
    training/differentiable and structural-init path; both produce the
    f32 residual stream.
    """

    dim: int
    cfg: AttentionConfig
    skip_first_norm: bool = False
    dtype: Optional[jnp.dtype] = None
    fused: bool = False

    def _fused_mode(self, deterministic: bool, x: Array):
        """'part' | 'dense' | None. Combines the structural gate (shipped
        config shape, bf16, inference) with the VMEM + Mosaic-geometry
        envelopes (ops/fused_attention.pair_fusion_mode): the 1M-element
        bound admits gen4 stage 1 (96x160x64, verified on v5e); small
        maps whose partition chunks Mosaic cannot lane-split run
        masked-dense; everything else falls back to the XLA path."""
        cfg = self.cfg
        ok = (self.fused and deterministic and not self.is_initializing()
              and self.dtype == jnp.bfloat16 and not cfg.mlp_gated
              and cfg.attention_bias and cfg.mlp_bias
              and cfg.ls_init_value > 0 and cfg.drop_path == 0.0
              and cfg.drop_mlp == 0.0 and cfg.mlp_activation == "gelu")
        if not ok:
            return None
        from rvt_tpu.ops.fused_attention import pair_fusion_mode

        return pair_fusion_mode(x.shape[1], x.shape[2], x.shape[3],
                                tuple(cfg.partition_size))

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        mode = self._fused_mode(deterministic, x)
        if mode is not None:
            from rvt_tpu.ops.fused_attention import (attention_block_params,
                                                     fused_attention_pair)

            p = self.variables["params"]
            return fused_attention_pair(
                x,
                attention_block_params(p["att_window"], self.skip_first_norm),
                attention_block_params(p["att_grid"], False),
                heads=self.dim // self.cfg.dim_head,
                dim_head=self.cfg.dim_head,
                part=tuple(self.cfg.partition_size),
                skip_first_norm=self.skip_first_norm,
                eps=self.cfg.norm_eps,
                dense=mode == "dense",
                interpret=jax.default_backend() == "cpu")

        x = PartitionAttention(dim=self.dim, partition_window=True, cfg=self.cfg,
                               skip_first_norm=self.skip_first_norm,
                               dtype=self.dtype,
                               name="att_window")(x, deterministic)
        x = PartitionAttention(dim=self.dim, partition_window=False, cfg=self.cfg,
                               dtype=self.dtype,
                               name="att_grid")(x, deterministic)
        return x


# ---------------------------------------------------------------------------
# Downsample (maxvit.py:143-182)
# ---------------------------------------------------------------------------


class _StemKernel(nn.Module):
    """Holds the 7x7 stem kernel under the same param path as nn.Conv
    ('conv/kernel') so checkpoints are layout-independent of the s2d mode."""

    shape: tuple

    @nn.compact
    def __call__(self) -> Array:
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class ConvDownsample(nn.Module):
    """Strided conv + LayerNorm, NHWC in/out.

    The reference takes NCHW and emits NHWC (``ConvDownsampling_Cf2Cl``);
    here both sides are NHWC (TPU layout), same math.

    ``s2d_input=True`` (stem only): the input arrives 4x4 space-to-depth
    blocked from the host pipeline and the stored 7x7 kernel is folded into
    the equivalent 2x2 kernel at trace time (rvt_tpu/ops/s2d.py) — ~5x
    faster stem on the MXU, bit-identical math.
    """

    dim_out: int
    downsample_factor: int
    cfg: DownsampleConfig
    dtype: Optional[jnp.dtype] = None
    s2d_input: bool = False
    in_channels: int = 0  # required when s2d_input

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = self.downsample_factor
        assert f in (2, 4, 8)
        if self.cfg.overlap:
            kernel_size = (f - 1) * 2 + 1
            pad = kernel_size // 2
        else:
            kernel_size = f
            pad = 0
        if self.s2d_input:
            from rvt_tpu.ops.s2d import BLOCK, fold_stem_kernel

            assert f == BLOCK and self.cfg.overlap, "s2d supports the k7/s4 stem"
            w7 = _StemKernel(shape=(kernel_size, kernel_size,
                                    self.in_channels, self.dim_out),
                             name="conv")()
            wk = fold_stem_kernel(w7)
            # Cast unconditionally: the input may arrive in its uint8
            # storage dtype (the eval scan feeds raw window slices so the
            # full-window float copy is never materialised in HBM).
            conv_dtype = self.dtype if self.dtype is not None else wk.dtype
            x = x.astype(conv_dtype)
            wk = wk.astype(conv_dtype)
            x = jax.lax.conv_general_dilated(
                x, wk, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            x = nn.Conv(self.dim_out, kernel_size=(kernel_size, kernel_size),
                        strides=(f, f), padding=[(pad, pad), (pad, pad)],
                        use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.LayerNorm(epsilon=self.cfg.norm_eps,
                         use_bias=self.cfg.norm_affine,
                         use_scale=self.cfg.norm_affine, dtype=self.dtype,
                         name="norm")(x)
        return x


# ---------------------------------------------------------------------------
# ConvLSTM (rnn.py:7-69)
# ---------------------------------------------------------------------------


class DWSConvLSTM2d(nn.Module):
    """Depthwise-separable ConvLSTM cell, NHWC.

    One recurrence step: carries ``(h, c)`` with the same spatial dims as
    ``x``. Gate order matches ``rnn.py:57-66``: sigmoid(forget, input,
    output) then tanh(cell update). The temporal loop lives *outside* in a
    ``lax.scan`` with donated carry — never a Python loop under jit.

    With ``fused=True`` (serving, shipped dws_conv=False variant) the whole
    cell runs as one Pallas kernel (rvt_tpu/ops/fused_lstm.py).
    """

    dim: int
    cfg: LstmConfig
    dtype: Optional[jnp.dtype] = None
    fused: bool = False

    def _fused_supported(self, deterministic: bool) -> bool:
        cfg = self.cfg
        return (self.fused and deterministic and not self.is_initializing()
                and self.dtype == jnp.bfloat16 and not cfg.dws_conv
                and cfg.drop_cell_update == 0.0)

    @nn.compact
    def __call__(self, x: Array, h_c: Tuple[Array, Array],
                 deterministic: bool = True) -> Tuple[Array, Array]:
        cfg = self.cfg
        h_tm1, c_tm1 = h_c

        if self._fused_supported(deterministic):
            from rvt_tpu.ops.fused_lstm import fused_conv_lstm

            p = self.variables["params"]["conv1x1"]
            w = jnp.asarray(p["kernel"], jnp.bfloat16).reshape(
                2 * self.dim, 4 * self.dim)
            b = jnp.asarray(p["bias"], jnp.bfloat16).reshape(1, -1)
            return fused_conv_lstm(x, h_tm1, c_tm1, w, b,
                                   interpret=jax.default_backend() == "cpu")

        if cfg.dws_conv and cfg.dws_conv_only_hidden:
            k = cfg.dws_conv_kernel_size
            h_tm1 = nn.Conv(self.dim, kernel_size=(k, k), padding=[(k // 2, k // 2)] * 2,
                            feature_group_count=self.dim, dtype=self.dtype,
                            name="conv3x3_dws")(h_tm1)
        xh = jnp.concatenate([x, h_tm1.astype(x.dtype)], axis=-1)
        if cfg.dws_conv and not cfg.dws_conv_only_hidden:
            k = cfg.dws_conv_kernel_size
            xh = nn.Conv(2 * self.dim, kernel_size=(k, k), padding=[(k // 2, k // 2)] * 2,
                         feature_group_count=2 * self.dim, dtype=self.dtype,
                         name="conv3x3_dws")(xh)
        mix = nn.Conv(4 * self.dim, kernel_size=(1, 1), dtype=self.dtype,
                      name="conv1x1")(xh)

        # Gate activations run in the compute dtype (halves HBM traffic in
        # bf16 mode); the cell-state update itself is f32 so the recurrent
        # carry stays numerically stable and dtype-invariant across steps.
        gates, cell_input = mix[..., : 3 * self.dim], mix[..., 3 * self.dim:]
        gates = jax.nn.sigmoid(gates)
        forget_gate = gates[..., : self.dim].astype(jnp.float32)
        input_gate = gates[..., self.dim: 2 * self.dim].astype(jnp.float32)
        output_gate = gates[..., 2 * self.dim:].astype(jnp.float32)
        cell_input = jnp.tanh(cell_input).astype(jnp.float32)
        if cfg.drop_cell_update > 0.0:
            cell_input = nn.Dropout(rate=cfg.drop_cell_update)(
                cell_input, deterministic=deterministic)

        c_t = forget_gate * c_tm1.astype(jnp.float32) + input_gate * cell_input
        h_t = output_gate * jnp.tanh(c_t)
        return h_t, c_t
