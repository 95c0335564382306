"""Whole-window backbone stage scan as a single Pallas TPU kernel.

The eval hot loop is a 21-step recurrence (``lax.scan`` over time) whose
body launches one kernel per stage per step. That structure pays, every
step: the LSTM carry round trip to HBM (~5 MB/image f32 across stages),
a full re-stage of every stage's weights HBM->VMEM (~45 MB bf16 for
RVT-B), and per-kernel launch overhead (84 launches per window).

Here the TIME LOOP moves inside the kernel: the grid is ``(B, T)`` with
t innermost, the LSTM carry lives in VMEM scratch across grid steps
(Pallas TPU grids run sequentially on the core, the standard accumulator
pattern), and weights are fetched once per window (their block index
never changes, so the pipeline does not re-copy them). Per step the
kernel runs the whole post-downsample stage — window attention, MLPs,
grid attention, ConvLSTM — exactly as ``fused_attention._stage_kernel``.

The per-step downsample convs stay in XLA but are batched over the whole
window (one conv over T*B images instead of T convs of B), see
``models/detector.py:fused_scan_backbone``.

Outputs: the per-step hidden states (bf16 — every consumer, the next
stage's conv and the FPN, casts to bf16 anyway) and the final (h, c)
f32 carry.

Serving-only (no VJP); reference semantics: maxvit_rnn.py:169-181 per
step, modules/detection.py:131-158 for the loop.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rvt_tpu.ops.fused_attention import (_N_PARAMS, _N_PARAMS_SFN, _DOT,
                                         _one_block)

Array = jax.Array

# LSTM-epilogue row-chunking thresholds (see _stage_scan_kernel): maps
# above _CHUNK_ELEMS elements chunk their cell math to ~_CHUNK_TARGET
# bytes of f32 temporaries. Module-level so tests can force the chunked
# path at tiny geometries (it is bitwise equal to monolithic: every
# output row depends only on its own row).
_CHUNK_ELEMS = 512 * 1024
_CHUNK_TARGET = 4 * 2 ** 20

# fused_lstm_scan row-slab size (elements per grid block). 512k keeps
# gen4 stage 1 at 2 slabs/image (grid 8*2*5 = 80 programs vs 320 at the
# 128k first tried — program-dispatch overhead dominated); the measured
# stack at a 491k slab is 53.1 MB (f32 mix accumulator + gate tensors),
# under the 64 MB scoped-vmem cap below. Module-level so tests can force
# the slab split at tiny geometries.
_SLAB_ELEMS = 512 * 1024


def _stage_scan_kernel(*refs, blocks, H, W, C, heads, dh, part, eps,
                       ds_ln, ds_eps, dense):
    """refs: x_t, [ds LN scale, bias,] *attn_params, [bias_w, bias_g,]
    lstm_w, lstm_b, h0, c0 -> h_seq_t, h_T, c_T, scratch (h_s, c_s).
    With ``dense`` the image blocks are [T, C] (masked-dense attention,
    see fused_attention._one_block)."""
    x_ref = refs[0]
    lstm_w, lstm_b, h0_ref, c0_ref = refs[-9:-5]
    hseq_ref, hT_ref, cT_ref = refs[-5:-2]
    h_s, c_s = refs[-2:]
    if dense:
        bias_w, bias_g = refs[-11:-9]
        prms = refs[1:-11]
    else:
        bias_w = bias_g = None
        prms = refs[1:-9]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_s[...] = h0_ref[0]
        c_s[...] = c0_ref[0]

    if ds_ln:
        # the downsample conv's LayerNorm: a rowwise op, far cheaper here
        # than as a standalone XLA pass over the whole window (the C=64
        # lane reduce fuses badly out there)
        from rvt_tpu.ops.fused_attention import _layer_norm_f32

        x_bf16 = _layer_norm_f32(x_ref[0, 0].astype(jnp.float32),
                                 prms[0][...], prms[1][...], ds_eps)
        prms = prms[2:]
    else:
        x_bf16 = x_ref[0, 0]
    R = x_bf16.astype(jnp.float32)
    off = 0
    for window_mode, sfn, n in blocks:
        R = _one_block(R, prms[off:off + n], window_mode=window_mode,
                       skip_first_norm=sfn, x_in_bf16=x_bf16, H=H, W=W,
                       C=C, heads=heads, dh=dh, part=part, eps=eps,
                       bias=(bias_w if window_mode else bias_g)
                       if dense else None)
        off += n
        x_bf16 = None

    T = H * W
    xb = R.astype(jnp.bfloat16).reshape(T, C)
    hb = h_s[...].astype(jnp.bfloat16).reshape(T, C)
    c_prev = c_s[...].reshape(T, C)
    # The cell is token-pointwise, so it runs in row chunks like the MLP:
    # the dominant temporaries are the f32 [chunk, 4C] matmul accumulator
    # and the f32 gate tensors (~9*chunk*C*4 bytes live). Monolithic for
    # gen1-sized maps; gen4-stage-1-class images (983k elems) chunk to
    # ~4 MB so the scan kernel stays inside its 100 MB scoped-vmem cap.
    chunk = T
    if T * C > _CHUNK_ELEMS:
        while chunk * C * 4 * 9 > _CHUNK_TARGET and chunk % 2 == 0:
            chunk //= 2
    h_parts, c_parts = [], []
    for s in range(0, T, chunk):
        xh = jnp.concatenate([xb[s:s + chunk], hb[s:s + chunk]], axis=-1)
        mix = jax.lax.dot_general(xh, lstm_w[...],
                                  dimension_numbers=(((1,), (0,)), ((), ())),
                                  **_DOT).astype(jnp.bfloat16) + lstm_b[...]
        gates = jax.nn.sigmoid(mix[:, :3 * C].astype(jnp.float32)
                               ).astype(jnp.bfloat16)
        forget_gate = gates[:, :C].astype(jnp.float32)
        input_gate = gates[:, C:2 * C].astype(jnp.float32)
        output_gate = gates[:, 2 * C:].astype(jnp.float32)
        cell_input = jnp.tanh(mix[:, 3 * C:].astype(jnp.float32)
                              ).astype(jnp.bfloat16).astype(jnp.float32)
        c_k = forget_gate * c_prev[s:s + chunk] + input_gate * cell_input
        h_parts.append(output_gate * jnp.tanh(c_k))
        c_parts.append(c_k)
    c_t = c_parts[0] if len(c_parts) == 1 else jnp.concatenate(c_parts, 0)
    h_t = h_parts[0] if len(h_parts) == 1 else jnp.concatenate(h_parts, 0)
    h_hw = h_t if dense else h_t.reshape(H, W, C)
    c_hw = c_t if dense else c_t.reshape(H, W, C)
    h_s[...] = h_hw
    c_s[...] = c_hw
    hseq_ref[0, 0] = h_hw.astype(jnp.bfloat16)
    # constant block index over t: the final write (t = T-1) is what lands
    hT_ref[0] = h_hw
    cT_ref[0] = c_hw


@functools.partial(
    jax.jit,
    static_argnames=("heads", "dim_head", "part", "eps", "ds_eps",
                     "dense", "interpret"))
def fused_stage_scan(x_seq: Array, params_window: Tuple[Array, ...],
                     params_grid: Tuple[Array, ...], lstm_w: Array,
                     lstm_b: Array, h0: Array, c0: Array, *, heads: int,
                     dim_head: int, part: Tuple[int, int], eps: float,
                     ds_ln_params: Tuple[Array, ...] = (),
                     ds_eps: float = 1e-5, dense: bool = False,
                     interpret: bool = False
                     ) -> Tuple[Array, Array, Array]:
    """Scan one backbone stage over a whole [T, B, H, W, C] bf16 window.

    Returns (h_seq [T, B, H, W, C] bf16, h_T f32, c_T f32). The input
    must already be downsampled; when ``ds_ln_params`` = (scale, bias)
    the downsample's LayerNorm runs inside the kernel (feed the raw conv
    output), otherwise the input must already be normed.

    ``dense`` selects the masked-dense attention path for geometries
    whose partition reshapes Mosaic rejects (caller decides via
    ``fused_attention.stage_fusion_mode``).
    """
    T, B, H, W, C = x_seq.shape
    blocks = ((True, True, _N_PARAMS_SFN), (False, False, _N_PARAMS))
    kernel = functools.partial(
        _stage_scan_kernel, blocks=blocks, H=H, W=W, C=C, heads=heads,
        dh=dim_head, part=part, eps=eps, ds_ln=bool(ds_ln_params),
        ds_eps=ds_eps, dense=dense)
    if dense:
        from rvt_tpu.ops.fused_attention import partition_bias

        Tk = H * W
        x_in = x_seq.reshape(T, B, Tk, C)
        h0_in, c0_in = h0.reshape(B, Tk, C), c0.reshape(B, Tk, C)
        seq = pl.BlockSpec((1, 1, Tk, C), lambda b, t: (t, b, 0, 0),
                           memory_space=pltpu.VMEM)
        img = pl.BlockSpec((1, Tk, C), lambda b, t: (b, 0, 0),
                           memory_space=pltpu.VMEM)
        seq_shape, img_shape = (T, B, Tk, C), (B, Tk, C)
        scratch = (Tk, C)
        extra = (partition_bias(H, W, part, True),
                 partition_bias(H, W, part, False))
    else:
        x_in, h0_in, c0_in = x_seq, h0, c0
        # time-major [T, B, ...] blocks (batch-major was tried: the input
        # transposes it avoids are cheaper than its strided block walks)
        seq = pl.BlockSpec((1, 1, H, W, C), lambda b, t: (t, b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        img = pl.BlockSpec((1, H, W, C), lambda b, t: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        seq_shape, img_shape = (T, B, H, W, C), (B, H, W, C)
        scratch = (H, W, C)
        extra = ()
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_p = (len(ds_ln_params) + len(params_window) + len(params_grid)
           + len(extra))
    h_seq, hT, cT = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[seq] + [full] * n_p + [full, full, img, img],
        out_specs=(seq, img, img),
        out_shape=(jax.ShapeDtypeStruct(seq_shape, jnp.bfloat16),
                   jax.ShapeDtypeStruct(img_shape, jnp.float32),
                   jax.ShapeDtypeStruct(img_shape, jnp.float32)),
        scratch_shapes=[pltpu.VMEM(scratch, jnp.float32),
                        pltpu.VMEM(scratch, jnp.float32)],
        # gen4-stage-1-class images (983k elements) need the larger cap:
        # f32 qkv accumulators + carry scratch push the stack past 48 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 if H * W * C > 512 * 1024 else 48)
            * 1024 * 1024),
        interpret=interpret,
    )(x_in, *ds_ln_params, *params_window, *params_grid, *extra,
      lstm_w, lstm_b, h0_in, c0_in)
    if dense:
        return (h_seq.reshape(T, B, H, W, C), hT.reshape(B, H, W, C),
                cT.reshape(B, H, W, C))
    return h_seq, hT, cT


def _lstm_scan_kernel(x_ref, w_ref, b_ref, h0_ref, c0_ref, hseq_ref,
                      hT_ref, cT_ref, h_s, c_s, *, C: int):
    """Whole-window ConvLSTM scan over one row-slab of one image: grid
    (B, S, T) with t innermost, carry in VMEM scratch. The cell is
    per-pixel (no dws conv in shipped configs), so row-slab splitting is
    exact. Same numerics as ops/fused_lstm._lstm_kernel."""
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        h_s[...] = h0_ref[0]
        c_s[...] = c0_ref[0]

    Hs, W = x_ref.shape[2], x_ref.shape[3]
    T = Hs * W
    xb = x_ref[0, 0].astype(jnp.bfloat16).reshape(T, C)
    hb = h_s[...].astype(jnp.bfloat16).reshape(T, C)
    xh = jnp.concatenate([xb, hb], axis=-1)
    mix = jax.lax.dot_general(xh, w_ref[...],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              **_DOT).astype(jnp.bfloat16) + b_ref[...]
    gates = jax.nn.sigmoid(mix[:, :3 * C].astype(jnp.float32)
                           ).astype(jnp.bfloat16)
    forget_gate = gates[:, :C].astype(jnp.float32)
    input_gate = gates[:, C:2 * C].astype(jnp.float32)
    output_gate = gates[:, 2 * C:].astype(jnp.float32)
    cell_input = jnp.tanh(mix[:, 3 * C:].astype(jnp.float32)
                          ).astype(jnp.bfloat16).astype(jnp.float32)
    c_t = forget_gate * c_s[...].reshape(T, C) + input_gate * cell_input
    h_t = output_gate * jnp.tanh(c_t)
    h_s[...] = h_t.reshape(Hs, W, C)
    c_s[...] = c_t.reshape(Hs, W, C)
    hseq_ref[0, 0] = h_s[...].astype(jnp.bfloat16)
    # constant block index over t: the final write (t = T-1) is what lands
    hT_ref[0] = h_s[...]
    cT_ref[0] = c_s[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_lstm_scan(x_seq: Array, lstm_w: Array, lstm_b: Array, h0: Array,
                    c0: Array, interpret: bool = False
                    ) -> Tuple[Array, Array, Array]:
    """Scan the ConvLSTM cell over a whole [T, B, H, W, C] window with the
    carry in VMEM (the 'split' serving mode for stages too large for the
    one-kernel stage scan). x_seq: attention-pair outputs, bf16 or f32.
    Returns (h_seq [T, B, H, W, C] bf16, h_T f32, c_T f32)."""
    T, B, H, W, C = x_seq.shape
    rows_split = 1
    while (H % (rows_split * 2) == 0
           and (H // rows_split) * W * C > _SLAB_ELEMS):
        rows_split *= 2
    Hs = H // rows_split
    seq = pl.BlockSpec((1, 1, Hs, W, C), lambda b, s, t: (t, b, s, 0, 0),
                       memory_space=pltpu.VMEM)
    img = pl.BlockSpec((1, Hs, W, C), lambda b, s, t: (b, s, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_lstm_scan_kernel, C=C)
    return pl.pallas_call(
        kernel,
        grid=(B, rows_split, T),
        in_specs=[seq, full, full, img, img],
        out_specs=(seq, img, img),
        out_shape=(jax.ShapeDtypeStruct((T, B, H, W, C), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, W, C), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((Hs, W, C), jnp.float32),
                        pltpu.VMEM((Hs, W, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_seq, lstm_w, lstm_b, h0, c0)


def split_stage_scan(x_seq: Array, params_window, params_grid,
                     lstm_w: Array, lstm_b: Array, h0: Array, c0: Array, *,
                     heads: int, dim_head: int, part: Tuple[int, int],
                     eps: float, ds_ln_params: Tuple[Array, ...] = (),
                     ds_eps: float = 1e-5, interpret: bool = False
                     ) -> Tuple[Array, Array, Array]:
    """'split' serving mode for stages beyond the one-kernel envelope
    (gen4 stage 1): the attention pair — which has no time recurrence —
    runs as one batched kernel launch over all T*B frames (weights staged
    once per launch), then ``fused_lstm_scan`` runs the recurrence with
    the carry in VMEM. x_seq: [T, B, H, W, C] bf16; with ``ds_ln_params``
    it is the raw downsample-conv output and the LN runs inside the pair
    kernel, else it must already be normed (the pair runs
    skip_first_norm=True either way)."""
    from rvt_tpu.ops.fused_attention import fused_attention_pair

    T, B, H, W, C = x_seq.shape
    y = fused_attention_pair(
        x_seq.reshape(T * B, H, W, C), params_window, params_grid,
        heads=heads, dim_head=dim_head, part=part, skip_first_norm=True,
        eps=eps, ds_ln_params=ds_ln_params, ds_eps=ds_eps,
        interpret=interpret)
    return fused_lstm_scan(y.reshape(T, B, H, W, C).astype(jnp.bfloat16),
                           lstm_w, lstm_b, h0, c0, interpret=interpret)
