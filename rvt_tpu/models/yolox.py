"""YOLOX detection neck & head, TPU-native (flax.linen, NHWC).

Equivalent math to the reference vendored Megvii code:
  * conv blocks      ``models/detection/yolox/models/network_blocks.py:29-142``
  * PAFPN            ``models/detection/yolox_extension/models/yolo_pafpn.py:18-139``
  * decoupled head   ``models/detection/yolox/models/yolo_head.py:21-289``

TPU-first deltas:
  * NHWC; upsampling is an exact 2x nearest repeat (XLA lowers this to a
    broadcast, matching torch's 'nearest-exact' for integer factor 2),
  * the head returns one statically shaped [B, A, 4+1+C] tensor of decoded
    boxes (cxcywh, absolute) + obj/cls *logits*; sigmoid is applied by
    callers. Box decode is fused into the same jit region,
  * grids/strides are compile-time constants folded by XLA.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from typing import Optional

from rvt_tpu.config import FPNConfig, HeadConfig

Array = jax.Array


def _act(name: str):
    if name == "silu":
        return jax.nn.silu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, 0.1)
    raise NotImplementedError(name)


class BaseConv(nn.Module):
    """Conv -> BatchNorm -> act (network_blocks.py:29-54)."""

    features: int
    ksize: int
    stride: int
    groups: int = 1
    act: str = "silu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pad = (self.ksize - 1) // 2
        x = nn.Conv(self.features, kernel_size=(self.ksize, self.ksize),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return _act(self.act)(x)


class DWConv(nn.Module):
    """Depthwise conv + pointwise conv (network_blocks.py:57-76)."""

    features: int
    ksize: int
    stride: int = 1
    act: str = "silu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        in_ch = x.shape[-1]
        x = BaseConv(in_ch, self.ksize, self.stride, groups=in_ch, act=self.act,
                     dtype=self.dtype, name="dconv")(x, train)
        return BaseConv(self.features, 1, 1, act=self.act, dtype=self.dtype,
                        name="pconv")(x, train)


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3 -> optional residual (network_blocks.py:79-101)."""

    features: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        hidden = int(self.features * self.expansion)
        y = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype,
                     name="conv1")(x, train)
        if self.depthwise:
            y = DWConv(self.features, 3, 1, act=self.act, dtype=self.dtype,
                       name="conv2")(y, train)
        else:
            y = BaseConv(self.features, 3, 1, act=self.act, dtype=self.dtype,
                         name="conv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class CSPLayer(nn.Module):
    """CSP bottleneck stack (network_blocks.py:104-142)."""

    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        hidden = int(self.features * self.expansion)
        x1 = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype,
                      name="conv1")(x, train)
        x2 = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype,
                      name="conv2")(x, train)
        for i in range(self.n):
            x1 = Bottleneck(hidden, self.shortcut, 1.0, self.depthwise,
                            act=self.act, dtype=self.dtype,
                            name=f"m{i}")(x1, train)
        x = jnp.concatenate([x1, x2], axis=-1)
        return BaseConv(self.features, 1, 1, act=self.act, dtype=self.dtype,
                        name="conv3")(x, train)


def upsample2x(x: Array) -> Array:
    """Exact nearest 2x upsample (== torch 'nearest-exact' for factor 2)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


class YoloPAFPN(nn.Module):
    """3-level top-down + bottom-up pyramid (yolo_pafpn.py:109-139)."""

    cfg: FPNConfig
    in_channels: Tuple[int, int, int]  # dims of stages (2, 3, 4)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[Array], train: bool = False) -> Tuple[Array, Array, Array]:
        depthwise = self.cfg.depthwise
        act = self.cfg.act
        dt = self.dtype
        n_csp = round(3 * self.cfg.depth)
        c2, c1, c0 = self.in_channels
        x2, x1, x0 = features  # strides 8, 16, 32

        fpn_out0 = BaseConv(c1, 1, 1, act=act, dtype=dt, name="lateral_conv0")(x0, train)
        f_out0 = jnp.concatenate([upsample2x(fpn_out0), x1], axis=-1)
        f_out0 = CSPLayer(c1, n_csp, False, depthwise=depthwise, act=act,
                          dtype=dt, name="C3_p4")(f_out0, train)

        fpn_out1 = BaseConv(c2, 1, 1, act=act, dtype=dt, name="reduce_conv1")(f_out0, train)
        f_out1 = jnp.concatenate([upsample2x(fpn_out1), x2], axis=-1)
        pan_out2 = CSPLayer(c2, n_csp, False, depthwise=depthwise, act=act,
                            dtype=dt, name="C3_p3")(f_out1, train)

        if depthwise:
            p_out1 = DWConv(c2, 3, 2, act=act, dtype=dt, name="bu_conv2")(pan_out2, train)
        else:
            p_out1 = BaseConv(c2, 3, 2, act=act, dtype=dt, name="bu_conv2")(pan_out2, train)
        p_out1 = jnp.concatenate([p_out1, fpn_out1], axis=-1)
        pan_out1 = CSPLayer(c1, n_csp, False, depthwise=depthwise, act=act,
                            dtype=dt, name="C3_n3")(p_out1, train)

        if depthwise:
            p_out0 = DWConv(c1, 3, 2, act=act, dtype=dt, name="bu_conv1")(pan_out1, train)
        else:
            p_out0 = BaseConv(c1, 3, 2, act=act, dtype=dt, name="bu_conv1")(pan_out1, train)
        p_out0 = jnp.concatenate([p_out0, fpn_out0], axis=-1)
        pan_out0 = CSPLayer(c0, n_csp, False, depthwise=depthwise, act=act,
                            dtype=dt, name="C3_n4")(p_out0, train)

        return pan_out2, pan_out1, pan_out0


def make_grids_and_strides(hw_per_level: Sequence[Tuple[int, int]],
                           strides: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Anchor-center grid (x, y) and per-anchor stride, concatenated over
    levels. Static — computed with numpy so XLA sees constants.
    Mirrors yolo_head.py:268-283."""
    grids = []
    stride_list = []
    for (h, w), s in zip(hw_per_level, strides):
        yv, xv = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grid = np.stack([xv, yv], axis=-1).reshape(-1, 2).astype(np.float32)
        grids.append(grid)
        stride_list.append(np.full((grid.shape[0], 1), s, dtype=np.float32))
    return np.concatenate(grids, axis=0), np.concatenate(stride_list, axis=0)


class YoloXHead(nn.Module):
    """Decoupled cls/reg/obj head + on-device decode (yolo_head.py:21-289).

    Returns [B, A, 4+1+C]: decoded boxes (cx, cy, w, h in input pixels) and
    raw objectness/class logits. ``prior_prob=0.01`` bias init on obj/cls
    (yolo_head.py:154-163).
    """

    cfg: HeadConfig
    in_channels: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (8, 16, 32)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[Array], train: bool = False) -> Array:
        num_classes = self.cfg.num_classes
        act = self.cfg.act
        # Width auto-scaling (yolo_head.py:47-55)
        width = self.in_channels[-1] / 1024
        hidden = int(256 * width)
        prior_bias = float(-np.log((1 - 0.01) / 0.01))
        Conv = DWConv if self.cfg.depthwise else BaseConv

        outputs = []
        hw_per_level = []
        for k, x in enumerate(features):
            x = BaseConv(hidden, 1, 1, act=act, dtype=self.dtype,
                         name=f"stem{k}")(x, train)
            cls_feat = x
            for j in range(2):
                cls_feat = Conv(hidden, 3, 1, act=act, dtype=self.dtype,
                                name=f"cls_conv{k}_{j}")(cls_feat, train)
            cls_out = nn.Conv(num_classes, (1, 1),
                              bias_init=nn.initializers.constant(prior_bias),
                              name=f"cls_pred{k}")(cls_feat)
            reg_feat = x
            for j in range(2):
                reg_feat = Conv(hidden, 3, 1, act=act, dtype=self.dtype,
                                name=f"reg_conv{k}_{j}")(reg_feat, train)
            reg_out = nn.Conv(4, (1, 1), name=f"reg_pred{k}")(reg_feat)
            obj_out = nn.Conv(1, (1, 1),
                              bias_init=nn.initializers.constant(prior_bias),
                              name=f"obj_pred{k}")(reg_feat)

            B, H, W, _ = reg_out.shape
            hw_per_level.append((H, W))
            out = jnp.concatenate([reg_out, obj_out, cls_out], axis=-1)
            outputs.append(out.reshape(B, H * W, 5 + num_classes))

        out = jnp.concatenate(outputs, axis=1)  # [B, A, 5+C]
        grid, stride = make_grids_and_strides(hw_per_level, self.strides)
        grid = jnp.asarray(grid, dtype=jnp.float32)
        stride = jnp.asarray(stride, dtype=jnp.float32)
        # Decode in f32 (exp can overflow bf16 ranges early in training).
        reg = out[..., :4].astype(jnp.float32)
        xy = (reg[..., :2] + grid) * stride
        wh = jnp.exp(reg[..., 2:4]) * stride
        rest = out[..., 4:].astype(jnp.float32)
        return jnp.concatenate([xy, wh, rest], axis=-1)
