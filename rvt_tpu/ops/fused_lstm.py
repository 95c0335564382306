"""Fused ConvLSTM cell as a Pallas TPU kernel.

The shipped RVT configs run ``DWSConvLSTM2d`` without the optional
depthwise conv (reference ``config/model/maxvit_yolox/default.yaml:38-42``
sets ``dws_conv: False``), so one cell step is: concat [x, h] -> 1x1 conv
(a [T, 2C] @ [2C, 4C] matmul) -> sigmoid/tanh gates -> f32 cell update
(models/layers.py:DWSConvLSTM2d, reference ``rnn.py:36-68``). On the XLA
path that is ~6 HBM-roundtrip fusions per stage per scan step (the gate
matmul, gate nonlinearities, the f32 cell/hidden chain, layout copies);
here the whole cell runs as one kernel per batch image with the concat,
matmul, gates and state math VMEM-resident.

Numerics mirror the XLA path exactly: inputs cast to bf16 for the matmul
(f32 accumulation), sigmoid/tanh of the gates in bf16, the cell-state
update and hidden output in f32.

Serving-only (no VJP); the flax module falls back to the XLA path for
training, f32 compute, or the dws_conv=True variant.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Mosaic requires a 32-bit matmul accumulator (preferred=bf16 fails to
# verify), so the dot accumulates f32 and rounds explicitly.
_DOT = dict(preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)


def _lstm_kernel(x_ref, h_ref, c_ref, w_ref, b_ref, ho_ref, co_ref, *,
                 C: int):
    H, W = x_ref.shape[1], x_ref.shape[2]
    T = H * W
    xb = x_ref[0].astype(jnp.bfloat16).reshape(T, C)
    hb = h_ref[0].astype(jnp.bfloat16).reshape(T, C)
    xh = jnp.concatenate([xb, hb], axis=-1)
    mix = jax.lax.dot_general(xh, w_ref[...],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              **_DOT).astype(jnp.bfloat16) + b_ref[...]
    # Nonlinearities in f32 then rounded to bf16 — same numerics as the
    # XLA path's bf16 sigmoid/tanh (which upcast internally); Mosaic's
    # bf16 logistic trips a broadcast verifier bug.
    gates = jax.nn.sigmoid(mix[:, :3 * C].astype(jnp.float32)
                           ).astype(jnp.bfloat16)
    forget_gate = gates[:, :C].astype(jnp.float32)
    input_gate = gates[:, C:2 * C].astype(jnp.float32)
    output_gate = gates[:, 2 * C:].astype(jnp.float32)
    cell_input = jnp.tanh(mix[:, 3 * C:].astype(jnp.float32)
                          ).astype(jnp.bfloat16).astype(jnp.float32)

    c_t = (forget_gate * c_ref[0].astype(jnp.float32).reshape(T, C)
           + input_gate * cell_input)
    h_t = output_gate * jnp.tanh(c_t)
    ho_ref[0] = h_t.reshape(H, W, C)
    co_ref[0] = c_t.reshape(H, W, C)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_conv_lstm(x: Array, h: Array, c: Array, w: Array, b: Array,
                    interpret: bool = False) -> Tuple[Array, Array]:
    """One ConvLSTM step, fused. x: [B, H, W, C] (f32 residual stream or
    bf16); h, c: [B, H, W, C] f32 carries; w: [2C, 4C] bf16; b: [1, 4C]
    bf16. Returns (h_t, c_t) f32.

    The cell is per-pixel (no spatial mixing without the dws conv), so the
    grid also splits image rows to keep each program's working set well
    inside VMEM at stage-1 spatial sizes."""
    B, H, W, C = x.shape
    rows_split = 1
    while (H % (rows_split * 2) == 0
           and (H // rows_split) * W * C > 128 * 1024):
        rows_split *= 2
    Hs = H // rows_split
    kernel = functools.partial(_lstm_kernel, C=C)
    spec = pl.BlockSpec((1, Hs, W, C), lambda b_, s: (b_, s, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, rows_split),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, W, C), jnp.float32)),
        interpret=interpret,
    )(x, h, c, w, b)
    return out
