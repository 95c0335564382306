"""Fused backbone-stage kernels for TRAINING: custom-VJP Pallas forward
and backward passes.

Round-2 measurement: serving got 2x from the fused stage kernels while
the train step stayed at ~175 ms — the same f32 LSTM/LN elementwise chain
that dominated eval dominates the train step (docs/PERF.md), because the
serving kernels define no VJP. This module closes that: one Pallas kernel
per backbone stage per timestep for the forward, and ONE Pallas kernel
for the whole backward (attention pair + ConvLSTM cell), with every
intermediate VMEM-resident.

Two granularities share the same kernel bodies:
  * ``fused_stage_scan_train`` (the production path) runs one stage's
    WHOLE window per kernel — time loop in the Pallas grid, LSTM carry in
    VMEM, weights staged once per window (see the section comment below).
  * ``fused_stage_step_train`` is the per-timestep variant it grew from
    (kept for A/B profiling and as the pattern the tests cross-check).

Design (TPU-first, flash-attention-style):
  * ``fused_stage_train`` is a ``jax.custom_vjp`` per-timestep stage step.
    The residuals are just the step INPUTS (x_t, h_{t-1}, c_{t-1},
    params) — no activation stash. The backward kernel recomputes the
    forward chain in VMEM (block-at-a-time, classic 2-level checkpoint)
    and backprops through MLP -> attention -> LayerNorms -> ConvLSTM.
  * The temporal loop stays a ``lax.scan`` outside: its transpose chains
    the (dh, dc) carries and accumulates the per-step parameter
    cotangents — exactly the BPTT structure, with XLA doing only cheap
    param-sized adds.
  * Weight gradients accumulate across the batch grid inside the kernel
    (outputs with constant index maps, init at b == 0 — the TPU grid is
    sequential).
  * LayerScale gammas stay UNFOLDED (separate f32 params) unlike the
    serving layout (``attention_block_params`` folds them into proj/fc2):
    they are trainable and need their own gradients.
  * Numerics mirror the XLA module path: bf16 MXU matmuls with f32
    accumulation, f32 LN stats / softmax / LayerScale / cell-state math.
    Gradient parity vs the XLA path is tested at bf16-noise tolerance
    (tests/test_fused_train.py).

Reference semantics: ``models/layers/maxvit/maxvit.py:185-270`` (block
pair), ``models/layers/rnn.py:36-68`` (cell), trained by the Lightning
loop at ``modules/detection.py:131-158``.

Envelopes (see ``train_stage_mode``): the one-kernel whole-stage path
covers per-image working sets <= 512k elements; gen4-stage-1-class
stages (512k-1M elements/image) train through the 'split' mode —
``fused_pair_train`` (batched custom-VJP attention pair over all T*B
frames) + ``fused_lstm_scan_train`` (whole-window cell scan with the
(dh, dc) BPTT carry in VMEM, row-slab split). Multi-device dispatch is
explicit shard_map over the mesh batch axis (models/detector.py:
``scan_backbone``); the kernels themselves grid per image, so batch
sharding is exact.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rvt_tpu.ops.fused_attention import (_DOT, dense_attention_ok,
                                         partition_bias,
                                         partition_geometry_ok)

Array = jax.Array

# params per sub-block (train layout, LayerScale NOT folded):
# [ln1_s, ln1_b] (absent when skip_first_norm), qkv_w, qkv_b, proj_w,
# proj_b, ls1_g, ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b, ls2_g.
_N_TRAIN = 14
_N_TRAIN_SFN = 12

_RSQRT = jax.lax.rsqrt
_C0 = 0.7978845608028654  # sqrt(2/pi)
_C1 = 0.044715


def _parse_cfg(cfg):
    """(heads, dim_head, part, eps, ds_eps, dense, interpret[, ds_ln]).

    ``ds_ln=False`` (8th element, default True) skips the in-kernel
    downsample LayerNorm: the input arrives already normed — the
    token-masking path runs stage 1's LN + mask-token replacement in XLA
    (reference order: maxvit_rnn.py:174-176, mask applied to the
    downsample OUTPUT) and the ds scale/bias get zero cotangents from
    the kernels (their real gradients flow through the XLA LN)."""
    heads, dim_head, part, eps, ds_eps, dense, interpret = cfg[:7]
    ds_ln = cfg[7] if len(cfg) > 7 else True
    return heads, dim_head, part, eps, ds_eps, dense, interpret, ds_ln


def train_block_params(p: dict, skip_first_norm: bool) -> Tuple[Array, ...]:
    """Flatten one PartitionAttention param subtree for the train kernels:
    weights/LN affine pre-cast to bf16 (as the XLA modules would),
    LayerScale gammas kept separate in f32."""
    bf = lambda a: jnp.asarray(a, jnp.bfloat16).reshape(1, -1)
    bfw = lambda a: jnp.asarray(a, jnp.bfloat16)
    f32 = lambda a: jnp.asarray(a, jnp.float32).reshape(1, -1)
    attn = p["self_attn"]
    out = []
    if not skip_first_norm:
        out += [bf(p["norm1"]["scale"]), bf(p["norm1"]["bias"])]
    out += [bfw(attn["qkv"]["kernel"]), bf(attn["qkv"]["bias"]),
            bfw(attn["proj"]["kernel"]), bf(attn["proj"]["bias"]),
            f32(p["ls1"]["gamma"]),
            bf(p["norm2"]["scale"]), bf(p["norm2"]["bias"]),
            bfw(p["mlp"]["fc1"]["kernel"]), bf(p["mlp"]["fc1"]["bias"]),
            bfw(p["mlp"]["fc2"]["kernel"]), bf(p["mlp"]["fc2"]["bias"]),
            f32(p["ls2"]["gamma"])]
    return tuple(out)


def _ln_fwd(x_f32, s_bf16, b_bf16, eps):
    """LayerNorm forward; returns (y_bf16, xhat_f32, rstd_f32)."""
    mu = jnp.mean(x_f32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = _RSQRT(var + eps)
    xhat = (x_f32 - mu) * rstd
    y = xhat * s_bf16.astype(jnp.float32) + b_bf16.astype(jnp.float32)
    return y.astype(jnp.bfloat16), xhat, rstd


def _ln_bwd(dy_f32, xhat, rstd, s_bf16):
    """LayerNorm backward. Returns (dx, ds [1, C], db [1, C])."""
    ds = jnp.sum(dy_f32 * xhat, axis=0, keepdims=True)
    db = jnp.sum(dy_f32, axis=0, keepdims=True)
    dxhat = dy_f32 * s_bf16[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    return dx, ds, db


def _gelu_fwd(h_bf16):
    hf = h_bf16.astype(jnp.float32)
    inner = _C0 * (hf + _C1 * hf * hf * hf)
    t = jnp.tanh(inner)
    g = 0.5 * hf * (1.0 + t)
    return g.astype(jnp.bfloat16), (hf, t)

def _gelu_bwd(dg_f32, saved):
    hf, t = saved
    dinner = 0.5 * hf * (1.0 - t * t) * _C0 * (1.0 + 3.0 * _C1 * hf * hf)
    return dg_f32 * (0.5 * (1.0 + t) + dinner)


def _dot(a, b):
    """[M, K] @ [K, N] with f32 accumulation."""
    return jax.lax.dot_general(a, b,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               **_DOT)


def _dot_t(a, b):
    """a^T @ b: contract the row dims -> [K_a, K_b] (weight grads)."""
    return jax.lax.dot_general(a, b,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               **_DOT)


def _dot_rt(a, b):
    """a @ b^T: contract the col dims -> [M_a, M_b]."""
    return jax.lax.dot_general(a, b,
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               **_DOT)


def _mlp_chunk_size(T: int, C: int) -> int:
    """Row-chunk size bounding the [rows, 4C] MLP/LSTM intermediates
    (same sizing rule as the serving kernel: 8 MB target, 4 MB for
    gen4-class images whose other tensors already crowd the stack)."""
    target = (4 if T * C > 512 * 1024 else 8) * 2 ** 20
    chunk = T
    while chunk * 4 * C * 4 > target and chunk % 2 == 0:
        chunk //= 2
    return chunk


def _partition(xa, *, window_mode, H, W, C, part):
    ph, pw = part
    nh, nw = H // ph, W // pw
    if window_mode:
        p = xa.reshape(nh, ph, nw, pw, C).transpose(0, 2, 1, 3, 4)
    else:
        p = xa.reshape(ph, nh, pw, nw, C).transpose(1, 3, 0, 2, 4)
    return p.reshape(nh * nw * ph * pw, C)


def _unpartition(tok, *, window_mode, H, W, C, part):
    ph, pw = part
    nh, nw = H // ph, W // pw
    out = tok.reshape(nh, nw, ph, pw, C)
    if window_mode:
        out = out.transpose(0, 2, 1, 3, 4)
    else:
        out = out.transpose(2, 0, 3, 1, 4)
    return out.reshape(H, W, C)


def _attn_heads_fwd(qkv, *, heads, dh, dense, bias, n_parts, n_tokens):
    """Per-head attention; qkv [T, 3C] (dense) or [nP, N, 3C]. Returns
    (attn_out bf16, probs list)."""
    scale = dh ** -0.5
    head_outs, probs_saved = [], []
    for h_i in range(heads):
        base = h_i * 3 * dh
        if dense:
            q = qkv[:, base:base + dh]
            k = qkv[:, base + dh:base + 2 * dh]
            v = qkv[:, base + 2 * dh:base + 3 * dh]
            st = _dot_rt(k, q) * scale + bias[...].astype(jnp.float32)
            pt = jax.nn.softmax(st, axis=0).astype(jnp.bfloat16)
            o = _dot_t(pt, v)
        else:
            q = qkv[:, :, base:base + dh]
            k = qkv[:, :, base + dh:base + 2 * dh]
            v = qkv[:, :, base + 2 * dh:base + 3 * dh]
            st = jax.lax.dot_general(
                k, q, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                **_DOT) * scale
            pt = jax.nn.softmax(st, axis=1).astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                pt, v, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                **_DOT)
        head_outs.append(o.astype(jnp.bfloat16))
        probs_saved.append(pt)
    return jnp.concatenate(head_outs, axis=-1), probs_saved


def _attn_heads_bwd(dattn, qkv, probs_saved, *, heads, dh, dense):
    """Backward of _attn_heads_fwd. dattn: [T, C] f32 (dense) or
    [nP, N, C]. Returns dqkv (bf16, same shape as qkv)."""
    scale = dh ** -0.5
    dqkv_cols = []
    for h_i in range(heads):
        base = h_i * 3 * dh
        pt = probs_saved[h_i]
        if dense:
            q = qkv[:, base:base + dh]
            k = qkv[:, base + dh:base + 2 * dh]
            v = qkv[:, base + 2 * dh:base + 3 * dh]
            do = dattn[:, h_i * dh:(h_i + 1) * dh].astype(jnp.bfloat16)
            # o = pt^T-contract-k @ v  (pt [Tk, Tq], o [Tq, dh])
            dv = _dot(pt, do)                         # [Tk, dh]
            dpt = _dot_rt(v, do)                      # [Tk, Tq]
            ptf = pt.astype(jnp.float32)
            ssum = jnp.sum(dpt * ptf, axis=0, keepdims=True)
            dst = ptf * (dpt - ssum)
            dsc = (dst * scale).astype(jnp.bfloat16)  # [Tk, Tq]
            dk = _dot(dsc, q)                         # [Tk, dh]
            dq = _dot_t(dsc, k)                       # [Tq, dh]
        else:
            q = qkv[:, :, base:base + dh]
            k = qkv[:, :, base + dh:base + 2 * dh]
            v = qkv[:, :, base + 2 * dh:base + 3 * dh]
            do = dattn[:, :, h_i * dh:(h_i + 1) * dh].astype(jnp.bfloat16)
            dv = jax.lax.dot_general(
                pt, do, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                **_DOT)  # contract Tq: [nP, Tk, dh]... see note below
            # pt [nP, Nk, Nq], do [nP, Nq, dh] -> dv [nP, Nk, dh]
            dpt = jax.lax.dot_general(
                v, do, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                **_DOT)  # [nP, Nk, Nq]
            ptf = pt.astype(jnp.float32)
            ssum = jnp.sum(dpt * ptf, axis=1, keepdims=True)
            dst = ptf * (dpt - ssum)
            dsc = (dst * scale).astype(jnp.bfloat16)
            dk = jax.lax.dot_general(
                dsc, q, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                **_DOT)  # [nP, Nk, dh]
            dq = jax.lax.dot_general(
                dsc, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                **_DOT)  # [nP, Nq, dh]
        dqkv_cols += [dq.astype(jnp.bfloat16), dk.astype(jnp.bfloat16),
                      dv.astype(jnp.bfloat16)]
    return jnp.concatenate(dqkv_cols, axis=-1)


def _block_fwd(R, prm, *, window_mode, skip_first_norm, x_in_bf16, H, W,
               C, heads, dh, part, eps, bias, store):
    """One sub-block forward (train layout: LS unfolded). Returns
    (R_out, saved) — saved is None unless ``store``."""
    dense = bias is not None
    i = 0
    ln1 = None
    if skip_first_norm:
        xa = x_in_bf16
    else:
        xa, xhat1, rstd1 = _ln_fwd(R, prm[0][...], prm[1][...], eps)
        ln1 = (xhat1, rstd1)
        i = 2
    (qkv_w, qkv_b, proj_w, proj_b, ls1_g, ln2_s, ln2_b,
     fc1_w, fc1_b, fc2_w, fc2_b, ls2_g) = prm[i:i + 12]

    tokens = xa if dense else _partition(xa, window_mode=window_mode,
                                         H=H, W=W, C=C, part=part)
    qkv = _dot(tokens, qkv_w[...]).astype(jnp.bfloat16) + qkv_b[...]
    n_parts = (H // part[0]) * (W // part[1])
    n_tokens = part[0] * part[1]
    if not dense:
        qkv = qkv.reshape(n_parts, n_tokens, 3 * C)
    attn, probs = _attn_heads_fwd(qkv, heads=heads, dh=dh, dense=dense,
                                  bias=bias, n_parts=n_parts,
                                  n_tokens=n_tokens)
    if not dense:
        attn = attn.reshape(n_parts * n_tokens, C)
    proj = _dot(attn, proj_w[...]).astype(jnp.bfloat16) + proj_b[...]
    unpart = proj if dense else _unpartition(
        proj.reshape(n_parts, n_tokens, C).reshape(n_parts * n_tokens, C),
        window_mode=window_mode, H=H, W=W, C=C, part=part)
    ls1 = unpart.astype(jnp.float32) * ls1_g[...]
    R_mid = R + (ls1.reshape(R.shape) if not dense else ls1)

    # MLP forward in row chunks (the [rows, 4C] hidden tensors are the
    # stack peak; the backward recomputes them chunk-wise from R_mid, so
    # nothing MLP-sized is ever saved)
    T = H * W
    R2 = R_mid.reshape(T, C)
    chunk = _mlp_chunk_size(T, C)
    outs = []
    for s in range(0, T, chunk):
        y, _, _ = _ln_fwd(R2[s:s + chunk], ln2_s[...], ln2_b[...], eps)
        h1 = _dot(y, fc1_w[...]).astype(jnp.bfloat16) + fc1_b[...]
        g, _ = _gelu_fwd(h1)
        m = _dot(g, fc2_w[...]).astype(jnp.bfloat16) + fc2_b[...]
        outs.append(m.astype(jnp.float32) * ls2_g[...])
    ls2 = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    R_out = R_mid + ls2.reshape(R_mid.shape)
    if not store:
        return R_out, None
    saved = dict(R_in=R, xa=xa, ln1=ln1, qkv=qkv, probs=probs, attn=attn,
                 unpart=unpart, R_mid=R_mid)
    return R_out, saved


def _block_bwd(dR_out, saved, prm, *, window_mode, skip_first_norm, H, W,
               C, heads, dh, part, eps, bias):
    """One sub-block backward. Returns (dR_in, dxa_or_None, grads list in
    param order). For skip_first_norm blocks the input-norm cotangent is
    returned separately as dxa (flows into x_in alongside dR_in)."""
    dense = bias is not None
    i = 0 if skip_first_norm else 2
    (qkv_w, qkv_b, proj_w, proj_b, ls1_g, ln2_s, ln2_b,
     fc1_w, fc1_b, fc2_w, fc2_b, ls2_g) = prm[i:i + 12]
    T = H * W
    n_parts = (H // part[0]) * (W // part[1])
    n_tokens = part[0] * part[1]

    # ---- MLP half: R_out = R_mid + (m * ls2).reshape ----
    # Row-chunked recompute-and-backprop: per chunk, rebuild (y, h1, g, m)
    # from the saved R_mid and backprop through fc2 -> gelu -> fc1 -> LN,
    # accumulating the weight grads. Nothing [T, 4C]-sized is ever live.
    dR_out2 = dR_out.reshape(T, C)
    R2 = saved["R_mid"].reshape(T, C)
    chunk = _mlp_chunk_size(T, C)
    dls2_g = dfc2_w = dfc2_b = dfc1_w = dfc1_b = dln2_s = dln2_b = 0.0
    dx_rows = []
    for s in range(0, T, chunk):
        Rc = R2[s:s + chunk]
        dRc = dR_out2[s:s + chunk]
        y, xhat, rstd = _ln_fwd(Rc, ln2_s[...], ln2_b[...], eps)
        h1 = _dot(y, fc1_w[...]).astype(jnp.bfloat16) + fc1_b[...]
        g, gelu_sv = _gelu_fwd(h1)
        m = _dot(g, fc2_w[...]).astype(jnp.bfloat16) + fc2_b[...]
        dls2_g = dls2_g + jnp.sum(m.astype(jnp.float32) * dRc, axis=0,
                                  keepdims=True)
        dm = dRc * ls2_g[...]
        dm_bf = dm.astype(jnp.bfloat16)
        dfc2_w = dfc2_w + _dot_t(g, dm_bf)
        dfc2_b = dfc2_b + jnp.sum(dm, axis=0, keepdims=True)
        dg = _dot_rt(dm_bf, fc2_w[...])
        dh1 = _gelu_bwd(dg, gelu_sv)
        dh1_bf = dh1.astype(jnp.bfloat16)
        dfc1_w = dfc1_w + _dot_t(y, dh1_bf)
        dfc1_b = dfc1_b + jnp.sum(dh1, axis=0, keepdims=True)
        dy = _dot_rt(dh1_bf, fc1_w[...])
        dxc, ds_c, db_c = _ln_bwd(dy, xhat, rstd, ln2_s)
        dln2_s = dln2_s + ds_c
        dln2_b = dln2_b + db_c
        dx_rows.append(dxc)
    dxln2 = (dx_rows[0] if len(dx_rows) == 1
             else jnp.concatenate(dx_rows, axis=0))
    dR_mid = dR_out + dxln2.reshape(dR_out.shape)

    # ---- attention half: R_mid = R_in + (unpart * ls1) ----
    dR_mid_flat = dR_mid.reshape(T, C) if not dense else dR_mid
    up_f32 = saved["unpart"].astype(jnp.float32)
    if not dense:
        up_f32 = up_f32.reshape(T, C)
    dls1_g = jnp.sum(up_f32 * dR_mid_flat, axis=0, keepdims=True)
    dunpart = dR_mid_flat * ls1_g[...]
    if dense:
        dproj_out = dunpart
    else:
        dproj_out = _partition(dunpart.reshape(H, W, C),
                               window_mode=window_mode, H=H, W=W, C=C,
                               part=part)
    dproj_bf = dproj_out.astype(jnp.bfloat16)
    dproj_w = _dot_t(saved["attn"], dproj_bf)
    dproj_b = jnp.sum(dproj_out, axis=0, keepdims=True)
    dattn = _dot_rt(dproj_bf, proj_w[...])
    if not dense:
        dattn = dattn.reshape(n_parts, n_tokens, C)
    dqkv = _attn_heads_bwd(dattn, saved["qkv"], saved["probs"],
                           heads=heads, dh=dh, dense=dense)
    if not dense:
        dqkv = dqkv.reshape(n_parts * n_tokens, 3 * C)
    tokens = saved["xa"] if dense else _partition(
        saved["xa"], window_mode=window_mode, H=H, W=W, C=C, part=part)
    dqkv_w = _dot_t(tokens, dqkv)
    dqkv_b = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    dtokens = _dot_rt(dqkv, qkv_w[...])
    dxa = dtokens if dense else _unpartition(
        dtokens.astype(jnp.float32), window_mode=window_mode, H=H, W=W,
        C=C, part=part)
    dxa = dxa.astype(jnp.float32)

    grads = [dqkv_w, dqkv_b, dproj_w, dproj_b, dls1_g, dln2_s, dln2_b,
             dfc1_w, dfc1_b, dfc2_w, dfc2_b, dls2_g]
    if skip_first_norm:
        return dR_mid, dxa, grads
    xhat1, rstd1 = saved["ln1"]
    dxln1, dln1_s, dln1_b = _ln_bwd(
        dxa.reshape(T, C), xhat1.reshape(T, C) if not dense else xhat1,
        rstd1.reshape(T, 1) if not dense else rstd1, prm[0])
    dR_in = dR_mid + dxln1.reshape(dR_mid.shape)
    return dR_in, None, [dln1_s, dln1_b] + grads


# ---------------------------------------------------------------------------
# Whole-stage step kernels (forward + backward)
# ---------------------------------------------------------------------------


def _lstm_recompute(R_out, h_in, c_in, lstm_w, lstm_b, T, C):
    """Recompute the cell exactly as the serving kernel does. Returns all
    values the backward needs."""
    xb = R_out.astype(jnp.bfloat16).reshape(T, C)
    hb = h_in.astype(jnp.bfloat16).reshape(T, C)
    xh = jnp.concatenate([xb, hb], axis=-1)
    mix = _dot(xh, lstm_w[...]).astype(jnp.bfloat16) + lstm_b[...]
    gates = jax.nn.sigmoid(mix[:, :3 * C].astype(jnp.float32)
                           ).astype(jnp.bfloat16)
    f_g = gates[:, :C].astype(jnp.float32)
    i_g = gates[:, C:2 * C].astype(jnp.float32)
    o_g = gates[:, 2 * C:].astype(jnp.float32)
    g_c = jnp.tanh(mix[:, 3 * C:].astype(jnp.float32)
                   ).astype(jnp.bfloat16).astype(jnp.float32)
    c_prev = c_in.astype(jnp.float32).reshape(T, C)
    c_t = f_g * c_prev + i_g * g_c
    h_t = o_g * jnp.tanh(c_t)
    return xh, f_g, i_g, o_g, g_c, c_prev, c_t, h_t


def _stage_step_fwd_kernel(*refs, H, W, C, heads, dh, part, eps, ds_eps,
                           dense, ds_ln=True):
    """refs: x, ds_s, ds_b, *win(12), *grid(14), [bias_w, bias_g,]
    lstm_w, lstm_b, h_in, c_in -> h_out, c_out."""
    x_ref = refs[0]
    ds_s, ds_b = refs[1], refs[2]
    lstm_w, lstm_b, h_ref, c_ref = refs[-6:-2]
    ho_ref, co_ref = refs[-2:]
    if dense:
        bias_w, bias_g = refs[-8:-6]
        prms = refs[3:-8]
    else:
        bias_w = bias_g = None
        prms = refs[3:-6]
    win, grid = prms[:_N_TRAIN_SFN], prms[_N_TRAIN_SFN:]

    xf = x_ref[0].astype(jnp.float32)
    if ds_ln:
        x_bf16, _, _ = _ln_fwd(xf, ds_s[...], ds_b[...], ds_eps)
    else:
        x_bf16 = xf.astype(jnp.bfloat16)
    R = x_bf16.astype(jnp.float32)
    R1, _ = _block_fwd(R, win, window_mode=True, skip_first_norm=True,
                       x_in_bf16=x_bf16, H=H, W=W, C=C, heads=heads,
                       dh=dh, part=part, eps=eps, bias=bias_w, store=False)
    R2, _ = _block_fwd(R1, grid, window_mode=False, skip_first_norm=False,
                       x_in_bf16=None, H=H, W=W, C=C, heads=heads, dh=dh,
                       part=part, eps=eps, bias=bias_g, store=False)
    T = H * W
    _, _, _, _, _, _, c_t, h_t = _lstm_recompute(
        R2, h_ref[0], c_ref[0], lstm_w, lstm_b, T, C)
    shape = (T, C) if dense else (H, W, C)
    ho_ref[0] = h_t.reshape(shape)
    co_ref[0] = c_t.reshape(shape)


def _acc(ref, is_first, val):
    """Accumulate a weight-grad output across the sequential grid.
    ``is_first`` must be True exactly on the first grid iteration."""
    @pl.when(is_first)
    def _init():
        ref[...] = val.astype(ref.dtype)

    @pl.when(jnp.logical_not(is_first))
    def _add():
        ref[...] += val.astype(ref.dtype)


def _recompute_R1(x_f32, ds_s, ds_b, win, *, H, W, C, heads, dh, part,
                  eps, ds_eps, bias_w, ds_ln=True):
    """Shared forward recompute: downsample LN + window block. Returns
    (R1, x_bf16, and the LN saveables). With ``ds_ln=False`` the input is
    already normed (and bf16-rounded) — the LN is skipped."""
    if ds_ln:
        x_bf16, xhat0, rstd0 = _ln_fwd(x_f32, ds_s[...], ds_b[...], ds_eps)
    else:
        x_bf16, xhat0, rstd0 = x_f32.astype(jnp.bfloat16), None, None
    R0 = x_bf16.astype(jnp.float32)
    R1, _ = _block_fwd(R0, win, window_mode=True, skip_first_norm=True,
                       x_in_bf16=x_bf16, H=H, W=W, C=C, heads=heads,
                       dh=dh, part=part, eps=eps, bias=bias_w, store=False)
    return R1, x_bf16, xhat0, rstd0


def _lstm_bwd_chunked(xb_full, hb_full, cp_full, dh_full, dc_full, lstm_w,
                      lstm_b, T, C):
    """Row-chunked ConvLSTM-cell recompute + backward (the cell is
    pointwise over tokens; the [rows, 4C] gate tensors are the stack
    peak). All inputs [T, C]-shaped (xb/hb bf16, rest f32). Returns
    (dlw_acc, dlb_acc, dR2 [T, C] f32, dhin [T, C] f32, dcin [T, C] f32).
    """
    chunk = _mlp_chunk_size(T, C)
    dlw_acc = dlb_acc = 0.0
    dR2_rows, dhin_rows, dcin_rows = [], [], []
    for s in range(0, T, chunk):
        xh = jnp.concatenate([xb_full[s:s + chunk], hb_full[s:s + chunk]],
                             axis=-1)
        mix = _dot(xh, lstm_w[...]).astype(jnp.bfloat16) + lstm_b[...]
        gates = jax.nn.sigmoid(mix[:, :3 * C].astype(jnp.float32)
                               ).astype(jnp.bfloat16)
        f_g = gates[:, :C].astype(jnp.float32)
        i_g = gates[:, C:2 * C].astype(jnp.float32)
        o_g = gates[:, 2 * C:].astype(jnp.float32)
        g_c = jnp.tanh(mix[:, 3 * C:].astype(jnp.float32)
                       ).astype(jnp.bfloat16).astype(jnp.float32)
        c_prev = cp_full[s:s + chunk]
        c_t = f_g * c_prev + i_g * g_c
        dhf = dh_full[s:s + chunk]
        dcf = dc_full[s:s + chunk]
        tc = jnp.tanh(c_t)
        do_g = dhf * tc
        dct = dcf + dhf * o_g * (1.0 - tc * tc)
        dmix = jnp.concatenate(
            [dct * c_prev * f_g * (1.0 - f_g),
             dct * g_c * i_g * (1.0 - i_g),
             do_g * o_g * (1.0 - o_g),
             dct * i_g * (1.0 - g_c * g_c)], axis=-1)
        dmix_bf = dmix.astype(jnp.bfloat16)
        dlw_acc = dlw_acc + _dot_t(xh, dmix_bf)
        dlb_acc = dlb_acc + jnp.sum(dmix, axis=0, keepdims=True)
        dxh = _dot_rt(dmix_bf, lstm_w[...])
        dR2_rows.append(dxh[:, :C].astype(jnp.float32))
        dhin_rows.append(dxh[:, C:2 * C].astype(jnp.float32))
        dcin_rows.append(dct * f_g)
    cat = (lambda rows: rows[0] if len(rows) == 1
           else jnp.concatenate(rows, axis=0))
    return dlw_acc, dlb_acc, cat(dR2_rows), cat(dhin_rows), cat(dcin_rows)


def _bwd_lstm_kernel(*refs, H, W, C, heads, dh, part, eps, ds_eps, dense,
                     ds_ln=True):
    """Backward kernel 1 of 3: recompute the forward chain (no stores)
    and backprop the ConvLSTM cell. The three-kernel split exists because
    Mosaic's scoped-VMEM stack reuse across a fwd-recompute + full
    backward in ONE kernel is poor — the single-kernel variant needed
    ~106 MB stack at RVT-T gen1 stage-1 geometry (64x80x32) vs the 96 MB
    cap; each split kernel stays well under it. The f32 residual
    checkpoint R1 and the cell cotangent dR2 pass through HBM (~1 MB per
    image at C=32 — noise next to the weight-grad traffic).

    refs in: x, ds_s, ds_b, *win(12), *grid(14), [bias_w, bias_g,]
    lstm_w, lstm_b, h_in, c_in, dh_t, dc_t
    refs out: R1 (f32 img), dR2 (f32 img), dlstm_w, dlstm_b, dh_in, dc_in.
    """
    b = pl.program_id(0)
    n_extra = 2 if dense else 0
    n_in = 3 + _N_TRAIN_SFN + _N_TRAIN + n_extra + 6
    in_refs, out_refs = refs[:n_in], refs[n_in:]
    x_ref, ds_s, ds_b = in_refs[0], in_refs[1], in_refs[2]
    prms = in_refs[3:3 + _N_TRAIN_SFN + _N_TRAIN]
    win, grid = prms[:_N_TRAIN_SFN], prms[_N_TRAIN_SFN:]
    if dense:
        bias_w, bias_g = in_refs[-8:-6]
    else:
        bias_w = bias_g = None
    lstm_w, lstm_b, h_ref, c_ref, dht_ref, dct_ref = in_refs[-6:]
    R1_ref, dR2_ref, dlw_ref, dlb_ref, dhin_ref, dcin_ref = out_refs

    T = H * W
    # ---- forward recompute (no stores) ----
    xf = x_ref[0].astype(jnp.float32)
    R1, _, _, _ = _recompute_R1(xf, ds_s, ds_b, win, H=H, W=W, C=C,
                                heads=heads, dh=dh, part=part, eps=eps,
                                ds_eps=ds_eps, bias_w=bias_w, ds_ln=ds_ln)
    R2, _ = _block_fwd(R1, grid, window_mode=False,
                       skip_first_norm=False, x_in_bf16=None, H=H,
                       W=W, C=C, heads=heads, dh=dh, part=part,
                       eps=eps, bias=bias_g, store=False)
    R1_ref[0] = R1.reshape(R1_ref.shape[1:])

    # ---- LSTM recompute + backward (row-chunked, see helper) ----
    dlw_acc, dlb_acc, dR2, dhin, dcin = _lstm_bwd_chunked(
        R2.reshape(T, C).astype(jnp.bfloat16),
        h_ref[0].astype(jnp.bfloat16).reshape(T, C),
        c_ref[0].astype(jnp.float32).reshape(T, C),
        dht_ref[0].astype(jnp.float32).reshape(T, C),
        dct_ref[0].astype(jnp.float32).reshape(T, C),
        lstm_w, lstm_b, T, C)
    _acc(dlw_ref, b == 0, dlw_acc)
    _acc(dlb_ref, b == 0, dlb_acc)
    shape = (T, C) if dense else (H, W, C)
    dhin_ref[0] = dhin.reshape(shape)
    dcin_ref[0] = dcin.reshape(shape)
    dR2_ref[0] = dR2.reshape(shape)


def _bwd_grid_kernel(*refs, H, W, C, heads, dh, part, eps, dense,
                     seq=False):
    """Backward kernel 2 of 3: grid-block backward from the R1 checkpoint.
    refs in: R1 (f32 img), *grid(14), [bias_g,] dR2 (f32 img)
    refs out: dR1 (f32 img), *dgrid(14).

    With ``seq`` the grid is (B, T) over a whole window (image blocks are
    [1, 1, ...] time-sliced; weight grads accumulate across b AND t) —
    the block backward itself has no time recurrence."""
    first = pl.program_id(0) == 0
    if seq:
        first = jnp.logical_and(first, pl.program_id(1) == 0)
    ix = (0, 0) if seq else (0,)
    R1_ref = refs[0]
    grid_p = refs[1:1 + _N_TRAIN]
    if dense:
        bias_g = refs[1 + _N_TRAIN]
        dR2_ref = refs[2 + _N_TRAIN]
        out_refs = refs[3 + _N_TRAIN:]
    else:
        bias_g = None
        dR2_ref = refs[1 + _N_TRAIN]
        out_refs = refs[2 + _N_TRAIN:]
    dR1_ref = out_refs[0]
    dgrid_refs = out_refs[1:]

    R1 = R1_ref[ix].astype(jnp.float32)
    _, saved_g = _block_fwd(R1, grid_p, window_mode=False,
                            skip_first_norm=False, x_in_bf16=None, H=H,
                            W=W, C=C, heads=heads, dh=dh, part=part,
                            eps=eps, bias=bias_g, store=True)
    dR2 = dR2_ref[ix].astype(jnp.float32).reshape(R1.shape)
    dR1, _, grads_g = _block_bwd(dR2, saved_g, grid_p, window_mode=False,
                                 skip_first_norm=False, H=H, W=W, C=C,
                                 heads=heads, dh=dh, part=part, eps=eps,
                                 bias=bias_g)
    for ref, val in zip(dgrid_refs, grads_g):
        _acc(ref, first, val)
    dR1_ref[ix] = dR1.reshape(dR1_ref.shape[len(ix):])


def _bwd_window_kernel(*refs, H, W, C, heads, dh, part, eps, ds_eps,
                       dense, seq=False, ds_ln=True):
    """Backward kernel 3 of 3: window-block + downsample-LN backward.
    refs in: x, ds_s, ds_b, *win(12), [bias_w,] dR1 (f32 img)
    refs out: dx (bf16 img), dds_s, dds_b, *dwin(12).
    ``seq``: (B, T) whole-window grid, as in _bwd_grid_kernel.
    ``ds_ln=False``: the input arrived pre-normed (token-mask path runs
    the LN + mask replacement in XLA) — the LN backward is skipped, dx is
    the raw residual+attention cotangent, and dds_s/dds_b are zero (the
    real LN-affine gradients flow through the XLA LN)."""
    first = pl.program_id(0) == 0
    if seq:
        first = jnp.logical_and(first, pl.program_id(1) == 0)
    ix = (0, 0) if seq else (0,)
    x_ref, ds_s, ds_b = refs[0], refs[1], refs[2]
    win_p = refs[3:3 + _N_TRAIN_SFN]
    if dense:
        bias_w = refs[3 + _N_TRAIN_SFN]
        dR1_ref = refs[4 + _N_TRAIN_SFN]
        out_refs = refs[5 + _N_TRAIN_SFN:]
    else:
        bias_w = None
        dR1_ref = refs[3 + _N_TRAIN_SFN]
        out_refs = refs[4 + _N_TRAIN_SFN:]
    dx_ref, dds_s_ref, dds_b_ref = out_refs[:3]
    dwin_refs = out_refs[3:]

    T = H * W
    xf = x_ref[ix].astype(jnp.float32)
    if ds_ln:
        x_bf16, xhat0, rstd0 = _ln_fwd(xf, ds_s[...], ds_b[...], ds_eps)
    else:
        x_bf16, xhat0, rstd0 = xf.astype(jnp.bfloat16), None, None
    R0 = x_bf16.astype(jnp.float32)
    _, saved_w = _block_fwd(R0, win_p, window_mode=True,
                            skip_first_norm=True, x_in_bf16=x_bf16, H=H,
                            W=W, C=C, heads=heads, dh=dh, part=part,
                            eps=eps, bias=bias_w, store=True)
    dR1 = dR1_ref[ix].astype(jnp.float32).reshape(R0.shape)
    dR0, dxa, grads_w = _block_bwd(dR1, saved_w, win_p, window_mode=True,
                                   skip_first_norm=True, H=H, W=W, C=C,
                                   heads=heads, dh=dh, part=part, eps=eps,
                                   bias=bias_w)
    for ref, val in zip(dwin_refs, grads_w):
        _acc(ref, first, val)

    # x_bf16 feeds both the residual stream (R0) and the sfn attention
    dxbf = dR0 + dxa.reshape(dR0.shape)
    if ds_ln:
        dxf, dds_s, dds_b = _ln_bwd(
            dxbf.reshape(T, C), xhat0.reshape(T, C),
            rstd0.reshape(T, 1), ds_s)
    else:
        dxf = dxbf.reshape(T, C)
        dds_s = jnp.zeros(dds_s_ref.shape, jnp.float32)
        dds_b = jnp.zeros(dds_b_ref.shape, jnp.float32)
    _acc(dds_s_ref, first, dds_s)
    _acc(dds_b_ref, first, dds_b)
    dx_ref[ix] = dxf.astype(jnp.bfloat16).reshape(x_ref.shape[len(ix):])


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_stage_step_train(cfg, x, ds_s, ds_b, win, grid, lstm_w, lstm_b,
                           h, c):
    """One backbone-stage timestep (downsample LN + attention pair +
    ConvLSTM cell) as a fused Pallas kernel WITH a fused Pallas VJP.

    cfg: hashable (heads, dim_head, part, eps, ds_eps, dense, interpret).
    x: [B, H, W, C] bf16 raw downsample-conv output; win/grid: train-layout
    param tuples (``train_block_params``); h, c: f32 carries.
    Returns (h_t, c_t) f32."""
    return _stage_fwd_call(cfg, x, ds_s, ds_b, win, grid, lstm_w, lstm_b,
                           h, c)


def _stage_fwd_call(cfg, x, ds_s, ds_b, win, grid, lstm_w, lstm_b, h, c):
    (heads, dim_head, part, eps, ds_eps, dense, interpret,
     ds_ln) = _parse_cfg(cfg)
    B, H, W, C = x.shape
    kernel = functools.partial(
        _stage_step_fwd_kernel, H=H, W=W, C=C, heads=heads, dh=dim_head,
        part=part, eps=eps, ds_eps=ds_eps, dense=dense, ds_ln=ds_ln)
    if dense:
        T = H * W
        x_in = x.reshape(B, T, C)
        h_in, c_in = h.reshape(B, T, C), c.reshape(B, T, C)
        img = pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
        oshape = (B, T, C)
        extra = (partition_bias(H, W, part, True),
                 partition_bias(H, W, part, False))
    else:
        x_in, h_in, c_in = x, h, c
        img = pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        oshape = (B, H, W, C)
        extra = ()
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_p = 2 + len(win) + len(grid) + len(extra)
    h_t, c_t = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[img] + [full] * n_p + [full, full, img, img],
        out_specs=(img, img),
        out_shape=(jax.ShapeDtypeStruct(oshape, jnp.float32),
                   jax.ShapeDtypeStruct(oshape, jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_in, ds_s, ds_b, *win, *grid, *extra, lstm_w, lstm_b, h_in, c_in)
    if dense:
        return h_t.reshape(B, H, W, C), c_t.reshape(B, H, W, C)
    return h_t, c_t


def _stage_fwd(cfg, x, ds_s, ds_b, win, grid, lstm_w, lstm_b, h, c):
    out = _stage_fwd_call(cfg, x, ds_s, ds_b, win, grid, lstm_w, lstm_b,
                          h, c)
    return out, (x, ds_s, ds_b, win, grid, lstm_w, lstm_b, h, c)


def _stage_bwd(cfg, res, cot):
    """Three chained Pallas kernels (LSTM bwd -> grid bwd -> window bwd);
    see ``_bwd_lstm_kernel`` for why the backward is split."""
    (heads, dim_head, part, eps, ds_eps, dense, interpret,
     ds_ln) = _parse_cfg(cfg)
    x, ds_s, ds_b, win, grid, lstm_w, lstm_b, h, c = res
    dh_t, dc_t = cot
    B, H, W, C = x.shape
    if dense:
        T = H * W
        x_in = x.reshape(B, T, C)
        h_in, c_in = h.reshape(B, T, C), c.reshape(B, T, C)
        dh_in = dh_t.reshape(B, T, C)
        dc_in = dc_t.reshape(B, T, C)
        img = pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
        oshape = (B, T, C)
        bias_w = (partition_bias(H, W, part, True),)
        bias_g = (partition_bias(H, W, part, False),)
    else:
        x_in, h_in, c_in, dh_in, dc_in = x, h, c, dh_t, dc_t
        img = pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        oshape = (B, H, W, C)
        bias_w = bias_g = ()
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fimg = jax.ShapeDtypeStruct(oshape, jnp.float32)
    vmem = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
    gshape = lambda ps: tuple(
        jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in ps)

    # kernel 1: forward chain + LSTM backward -> R1 checkpoint, dR2
    k1 = functools.partial(
        _bwd_lstm_kernel, H=H, W=W, C=C, heads=heads, dh=dim_head,
        part=part, eps=eps, ds_eps=ds_eps, dense=dense, ds_ln=ds_ln)
    n_p1 = 2 + len(win) + len(grid) + len(bias_w) + len(bias_g)
    R1, dR2, dlw, dlb, dh0, dc0 = pl.pallas_call(
        k1,
        grid=(B,),
        in_specs=[img] + [full] * n_p1 + [full, full, img, img, img, img],
        out_specs=(img, img, full, full, img, img),
        out_shape=(fimg, fimg,
                   jax.ShapeDtypeStruct(lstm_w.shape, jnp.float32),
                   jax.ShapeDtypeStruct(lstm_b.shape, jnp.float32),
                   fimg, fimg),
        compiler_params=vmem,
        interpret=interpret,
    )(x_in, ds_s, ds_b, *win, *grid, *bias_w, *bias_g, lstm_w, lstm_b,
      h_in, c_in, dh_in, dc_in)

    # kernel 2: grid-block backward from the R1 checkpoint
    k2 = functools.partial(
        _bwd_grid_kernel, H=H, W=W, C=C, heads=heads, dh=dim_head,
        part=part, eps=eps, dense=dense)
    outs2 = pl.pallas_call(
        k2,
        grid=(B,),
        in_specs=[img] + [full] * (len(grid) + len(bias_g)) + [img],
        out_specs=(img,) + (full,) * len(grid),
        out_shape=(fimg,) + gshape(grid),
        compiler_params=vmem,
        interpret=interpret,
    )(R1, *grid, *bias_g, dR2)
    dR1 = outs2[0]
    dgrid_f = outs2[1:]

    # kernel 3: window-block + downsample-LN backward
    k3 = functools.partial(
        _bwd_window_kernel, H=H, W=W, C=C, heads=heads, dh=dim_head,
        part=part, eps=eps, ds_eps=ds_eps, dense=dense, ds_ln=ds_ln)
    outs3 = pl.pallas_call(
        k3,
        grid=(B,),
        in_specs=[img, full, full] + [full] * (len(win) + len(bias_w))
        + [img],
        out_specs=(img, full, full) + (full,) * len(win),
        out_shape=(jax.ShapeDtypeStruct(x_in.shape, jnp.bfloat16),)
        + gshape((ds_s, ds_b)) + gshape(win),
        compiler_params=vmem,
        interpret=interpret,
    )(x_in, ds_s, ds_b, *win, *bias_w, dR1)
    dx = outs3[0]
    dds_s_f, dds_b_f = outs3[1], outs3[2]
    dwin_f = outs3[3:]

    if dense:
        dx = dx.reshape(B, H, W, C)
        dh0 = dh0.reshape(B, H, W, C)
        dc0 = dc0.reshape(B, H, W, C)
    cast = lambda g, p: g.astype(p.dtype)
    dwin = tuple(cast(g, p) for g, p in zip(dwin_f, win))
    dgrid = tuple(cast(g, p) for g, p in zip(dgrid_f, grid))
    return (dx.astype(x.dtype), cast(dds_s_f, ds_s), cast(dds_b_f, ds_b),
            dwin, dgrid, cast(dlw, lstm_w), cast(dlb, lstm_b), dh0, dc0)


fused_stage_step_train.defvjp(_stage_fwd, _stage_bwd)


# ---------------------------------------------------------------------------
# Whole-window train scan: the time loop moves into the Pallas grid
# ---------------------------------------------------------------------------
#
# The per-step custom-VJP above pays, at every one of the window's T
# timesteps, a full HBM->VMEM re-stage of the stage's weights plus kernel
# launch overhead — x4 kernels (1 fwd + 3 bwd) x T steps x 4 stages =
# ~336 launches per train step. The serving path already solved this
# (ops/fused_scan.py): grid (B, T) with t innermost, carry in VMEM
# scratch, weights fetched once per launch (their block index never
# changes). Here the same structure becomes differentiable:
#
#   * forward: one kernel per stage per window; additionally streams the
#     per-step h (bf16) and c (f32) sequences to HBM — exactly the
#     residuals the backward needs (LESS than the per-step path's scan
#     residuals, which stack h AND c in f32).
#   * backward kernel 1: grid (B, T) REVERSED over time, (dh, dc) BPTT
#     carry in VMEM scratch; recomputes the forward chain per step and
#     backprops the cell, emitting the R1 checkpoint + dR2 streams.
#   * backward kernels 2/3: the SAME per-step grid/window-block kernels,
#     just gridded (B, T) over the whole window (no time recurrence).
#
# Numerics are identical to the per-step path: h re-enters the next step
# cast to bf16 either way (the saved bf16 h_seq IS that rounding), c stays
# f32, and the carry/external cotangent sum matches the lax.scan transpose.


def _scan_fwd_train_kernel(*refs, H, W, C, heads, dh, part, eps, ds_eps,
                           dense, ds_ln=True):
    """refs in: x_seq, ds_s, ds_b, *win(12), *grid(14), [bias_w, bias_g,]
    lstm_w, lstm_b, h0, c0
    refs out: h_seq (bf16), c_seq (f32), hT, cT; scratch: h_s, c_s."""
    x_ref = refs[0]
    ds_s, ds_b = refs[1], refs[2]
    lstm_w, lstm_b, h0_ref, c0_ref = refs[-10:-6]
    hseq_ref, cseq_ref, hT_ref, cT_ref = refs[-6:-2]
    h_s, c_s = refs[-2:]
    if dense:
        bias_w, bias_g = refs[-12:-10]
        prms = refs[3:-12]
    else:
        bias_w = bias_g = None
        prms = refs[3:-10]
    win, grid = prms[:_N_TRAIN_SFN], prms[_N_TRAIN_SFN:]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_s[...] = h0_ref[0]
        c_s[...] = c0_ref[0]

    xf = x_ref[0, 0].astype(jnp.float32)
    R1, _, _, _ = _recompute_R1(xf, ds_s, ds_b, win, H=H, W=W, C=C,
                                heads=heads, dh=dh, part=part, eps=eps,
                                ds_eps=ds_eps, bias_w=bias_w, ds_ln=ds_ln)
    R2, _ = _block_fwd(R1, grid, window_mode=False, skip_first_norm=False,
                       x_in_bf16=None, H=H, W=W, C=C, heads=heads, dh=dh,
                       part=part, eps=eps, bias=bias_g, store=False)
    T = H * W
    _, _, _, _, _, _, c_t, h_t = _lstm_recompute(
        R2, h_s[...], c_s[...], lstm_w, lstm_b, T, C)
    shape = (T, C) if dense else (H, W, C)
    h_hw = h_t.reshape(shape)
    c_hw = c_t.reshape(shape)
    h_s[...] = h_hw
    c_s[...] = c_hw
    hseq_ref[0, 0] = h_hw.astype(jnp.bfloat16)
    cseq_ref[0, 0] = c_hw
    # constant block index over t: the final write (t = T-1) is what lands
    hT_ref[0] = h_hw
    cT_ref[0] = c_hw


def _bwd_lstm_scan_kernel(*refs, H, W, C, heads, dh, part, eps, ds_eps,
                          dense, ds_ln=True):
    """Whole-window backward kernel 1 of 3. Grid (B, T) whose seq index
    maps run time REVERSED (grid position t processes actual step
    T-1-t); the (dh, dc) BPTT carry lives in VMEM scratch.

    refs in: x_seq, ds_s, ds_b, *win(12), *grid(14), [bias_w, bias_g,]
    lstm_w, lstm_b, h_prev_seq (bf16), c_prev_seq (f32),
    dh_seq (bf16 cotangent of the h_seq output), dhT, dcT
    refs out: R1_seq (f32), dR2_seq (f32), dlstm_w, dlstm_b, dh0, dc0
    scratch: dh_s, dc_s (f32)."""
    b = pl.program_id(0)
    tr = pl.program_id(1)  # 0 first -> actual step T-1
    n_extra = 2 if dense else 0
    n_in = 3 + _N_TRAIN_SFN + _N_TRAIN + n_extra + 7
    in_refs = refs[:n_in]
    out_refs = refs[n_in:n_in + 6]
    dh_s, dc_s = refs[n_in + 6:]
    x_ref, ds_s, ds_b = in_refs[0], in_refs[1], in_refs[2]
    prms = in_refs[3:3 + _N_TRAIN_SFN + _N_TRAIN]
    win, grid = prms[:_N_TRAIN_SFN], prms[_N_TRAIN_SFN:]
    if dense:
        bias_w, bias_g = in_refs[-9:-7]
    else:
        bias_w = bias_g = None
    (lstm_w, lstm_b, hp_ref, cp_ref, dhs_ref, dhT_ref,
     dcT_ref) = in_refs[-7:]
    R1_ref, dR2_ref, dlw_ref, dlb_ref, dh0_ref, dc0_ref = out_refs

    @pl.when(tr == 0)
    def _init():
        dh_s[...] = dhT_ref[0]
        dc_s[...] = dcT_ref[0]

    T = H * W
    # ---- forward recompute to R2 (no stores) ----
    xf = x_ref[0, 0].astype(jnp.float32)
    R1, _, _, _ = _recompute_R1(xf, ds_s, ds_b, win, H=H, W=W, C=C,
                                heads=heads, dh=dh, part=part, eps=eps,
                                ds_eps=ds_eps, bias_w=bias_w, ds_ln=ds_ln)
    R2, _ = _block_fwd(R1, grid, window_mode=False, skip_first_norm=False,
                       x_in_bf16=None, H=H, W=W, C=C, heads=heads, dh=dh,
                       part=part, eps=eps, bias=bias_g, store=False)
    R1_ref[0, 0] = R1.reshape(R1_ref.shape[2:])

    # carried recurrent cotangent + this step's external (h_seq) cotangent
    dh_full = (dh_s[...].reshape(T, C)
               + dhs_ref[0, 0].astype(jnp.float32).reshape(T, C))
    dlw_acc, dlb_acc, dR2, dhin, dcin = _lstm_bwd_chunked(
        R2.reshape(T, C).astype(jnp.bfloat16),
        hp_ref[0, 0].reshape(T, C),
        cp_ref[0, 0].reshape(T, C),
        dh_full,
        dc_s[...].reshape(T, C),
        lstm_w, lstm_b, T, C)
    first = jnp.logical_and(b == 0, tr == 0)
    _acc(dlw_ref, first, dlw_acc)
    _acc(dlb_ref, first, dlb_acc)
    shape = (T, C) if dense else (H, W, C)
    dR2_ref[0, 0] = dR2.reshape(shape)
    dh_s[...] = dhin.reshape(shape)
    dc_s[...] = dcin.reshape(shape)
    # constant block over t: the last write (tr = T-1, actual step 0) lands
    dh0_ref[0] = dh_s[...]
    dc0_ref[0] = dc_s[...]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_stage_scan_train(cfg, x_seq, ds_s, ds_b, win, grid, lstm_w,
                           lstm_b, h0, c0):
    """Whole backbone-stage WINDOW (downsample LN + attention pair +
    ConvLSTM over all T steps) as one Pallas kernel with a fused Pallas
    VJP (three whole-window kernels).

    cfg: hashable (heads, dim_head, part, eps, ds_eps, dense, interpret).
    x_seq: [T, B, H, W, C] bf16 raw downsample-conv outputs; win/grid:
    train-layout param tuples (``train_block_params``); h0, c0: f32.
    Returns (h_seq [T, B, H, W, C] bf16, h_T f32, c_T f32)."""
    h_seq, _, hT, cT = _scan_fwd_call(cfg, x_seq, ds_s, ds_b, win, grid,
                                      lstm_w, lstm_b, h0, c0)
    return h_seq, hT, cT


def _scan_fwd_call(cfg, x_seq, ds_s, ds_b, win, grid, lstm_w, lstm_b, h0,
                   c0):
    (heads, dim_head, part, eps, ds_eps, dense, interpret,
     ds_ln) = _parse_cfg(cfg)
    T, B, H, W, C = x_seq.shape
    kernel = functools.partial(
        _scan_fwd_train_kernel, H=H, W=W, C=C, heads=heads, dh=dim_head,
        part=part, eps=eps, ds_eps=ds_eps, dense=dense, ds_ln=ds_ln)
    if dense:
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
        seq = pl.BlockSpec((1, 1, H, W, C), lambda b, t: (t, b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        img = pl.BlockSpec((1, H, W, C), lambda b, t: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        seq_shape, img_shape = (T, B, H, W, C), (B, H, W, C)
        scratch = (H, W, C)
        extra = ()
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_p = 2 + len(win) + len(grid) + len(extra)
    h_seq, c_seq, hT, cT = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[seq] + [full] * n_p + [full, full, img, img],
        out_specs=(seq, seq, img, img),
        out_shape=(jax.ShapeDtypeStruct(seq_shape, jnp.bfloat16),
                   jax.ShapeDtypeStruct(seq_shape, jnp.float32),
                   jax.ShapeDtypeStruct(img_shape, jnp.float32),
                   jax.ShapeDtypeStruct(img_shape, jnp.float32)),
        scratch_shapes=[pltpu.VMEM(scratch, jnp.float32),
                        pltpu.VMEM(scratch, jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret,
    )(x_in, ds_s, ds_b, *win, *grid, *extra, lstm_w, lstm_b, h0_in, c0_in)
    if dense:
        return (h_seq.reshape(T, B, H, W, C),
                c_seq.reshape(T, B, H, W, C),
                hT.reshape(B, H, W, C), cT.reshape(B, H, W, C))
    return h_seq, c_seq, hT, cT


def _scan_fwd_rule(cfg, x_seq, ds_s, ds_b, win, grid, lstm_w, lstm_b, h0,
                   c0):
    h_seq, c_seq, hT, cT = _scan_fwd_call(cfg, x_seq, ds_s, ds_b, win,
                                          grid, lstm_w, lstm_b, h0, c0)
    res = (x_seq, ds_s, ds_b, win, grid, lstm_w, lstm_b, h0, c0, h_seq,
           c_seq)
    return (h_seq, hT, cT), res


def _scan_bwd_rule(cfg, res, cot):
    (heads, dim_head, part, eps, ds_eps, dense, interpret,
     ds_ln) = _parse_cfg(cfg)
    (x_seq, ds_s, ds_b, win, grid, lstm_w, lstm_b, h0, c0, h_seq,
     c_seq) = res
    dh_seq, dhT, dcT = cot
    T, B, H, W, C = x_seq.shape
    # per-step carry INPUTS: what step t consumed is the step t-1 state
    # (bf16 h is exactly the rounding the kernel applies to its carry)
    h_prev = jnp.concatenate([h0.astype(jnp.bfloat16)[None], h_seq[:-1]],
                             axis=0)
    c_prev = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)
    dh_seq = dh_seq.astype(jnp.bfloat16)
    dhT = dhT.astype(jnp.float32)
    dcT = dcT.astype(jnp.float32)

    if dense:
        Tk = H * W
        rs = lambda a: a.reshape((T, B, Tk, C))
        x_in, h_prev, c_prev, dh_in = (rs(x_seq), rs(h_prev), rs(c_prev),
                                       rs(dh_seq))
        dhT_in, dcT_in = dhT.reshape(B, Tk, C), dcT.reshape(B, Tk, C)
        seq_r = pl.BlockSpec((1, 1, Tk, C),
                             lambda b, t, T=T: (T - 1 - t, b, 0, 0),
                             memory_space=pltpu.VMEM)
        seq_f = pl.BlockSpec((1, 1, Tk, C), lambda b, t: (t, b, 0, 0),
                             memory_space=pltpu.VMEM)
        img = pl.BlockSpec((1, Tk, C), lambda b, t: (b, 0, 0),
                           memory_space=pltpu.VMEM)
        seq_shape, img_shape = (T, B, Tk, C), (B, Tk, C)
        scratch = (Tk, C)
        bias_w = (partition_bias(H, W, part, True),)
        bias_g = (partition_bias(H, W, part, False),)
    else:
        x_in, dh_in, dhT_in, dcT_in = x_seq, dh_seq, dhT, dcT
        seq_r = pl.BlockSpec((1, 1, H, W, C),
                             lambda b, t, T=T: (T - 1 - t, b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        seq_f = pl.BlockSpec((1, 1, H, W, C), lambda b, t: (t, b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        img = pl.BlockSpec((1, H, W, C), lambda b, t: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        seq_shape, img_shape = (T, B, H, W, C), (B, H, W, C)
        scratch = (H, W, C)
        bias_w = bias_g = ()
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fseq = jax.ShapeDtypeStruct(seq_shape, jnp.float32)
    fimg = jax.ShapeDtypeStruct(img_shape, jnp.float32)
    gshape = lambda ps: tuple(
        jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in ps)

    # kernel 1 (time-reversed): fwd recompute + LSTM bwd, BPTT carry in
    # VMEM -> R1/dR2 streams + lstm grads + (dh0, dc0)
    k1 = functools.partial(
        _bwd_lstm_scan_kernel, H=H, W=W, C=C, heads=heads, dh=dim_head,
        part=part, eps=eps, ds_eps=ds_eps, dense=dense, ds_ln=ds_ln)
    n_p1 = 2 + len(win) + len(grid) + len(bias_w) + len(bias_g)
    R1_seq, dR2_seq, dlw, dlb, dh0, dc0 = pl.pallas_call(
        k1,
        grid=(B, T),
        in_specs=[seq_r] + [full] * n_p1
        + [full, full, seq_r, seq_r, seq_r, img, img],
        out_specs=(seq_r, seq_r, full, full, img, img),
        out_shape=(fseq, fseq,
                   jax.ShapeDtypeStruct(lstm_w.shape, jnp.float32),
                   jax.ShapeDtypeStruct(lstm_b.shape, jnp.float32),
                   fimg, fimg),
        scratch_shapes=[pltpu.VMEM(scratch, jnp.float32),
                        pltpu.VMEM(scratch, jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_in, ds_s, ds_b, *win, *grid, *bias_w, *bias_g, lstm_w, lstm_b,
      h_prev, c_prev, dh_in, dhT_in, dcT_in)

    # kernel 2: grid-block backward, no time recurrence -> (B, T) grid
    vmem = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
    k2 = functools.partial(
        _bwd_grid_kernel, H=H, W=W, C=C, heads=heads, dh=dim_head,
        part=part, eps=eps, dense=dense, seq=True)
    outs2 = pl.pallas_call(
        k2,
        grid=(B, T),
        in_specs=[seq_f] + [full] * (len(grid) + len(bias_g)) + [seq_f],
        out_specs=(seq_f,) + (full,) * len(grid),
        out_shape=(fseq,) + gshape(grid),
        compiler_params=vmem,
        interpret=interpret,
    )(R1_seq, *grid, *bias_g, dR2_seq)
    dR1_seq = outs2[0]
    dgrid_f = outs2[1:]

    # kernel 3: window-block + downsample-LN backward
    k3 = functools.partial(
        _bwd_window_kernel, H=H, W=W, C=C, heads=heads, dh=dim_head,
        part=part, eps=eps, ds_eps=ds_eps, dense=dense, seq=True,
        ds_ln=ds_ln)
    outs3 = pl.pallas_call(
        k3,
        grid=(B, T),
        in_specs=[seq_f, full, full] + [full] * (len(win) + len(bias_w))
        + [seq_f],
        out_specs=(seq_f, full, full) + (full,) * len(win),
        out_shape=(jax.ShapeDtypeStruct(x_in.shape, jnp.bfloat16),)
        + gshape((ds_s, ds_b)) + gshape(win),
        compiler_params=vmem,
        interpret=interpret,
    )(x_in, ds_s, ds_b, *win, *bias_w, dR1_seq)
    dx = outs3[0]
    dds_s_f, dds_b_f = outs3[1], outs3[2]
    dwin_f = outs3[3:]

    if dense:
        dx = dx.reshape(T, B, H, W, C)
        dh0 = dh0.reshape(B, H, W, C)
        dc0 = dc0.reshape(B, H, W, C)
    cast = lambda g, p: g.astype(p.dtype)
    dwin = tuple(cast(g, p) for g, p in zip(dwin_f, win))
    dgrid = tuple(cast(g, p) for g, p in zip(dgrid_f, grid))
    return (dx.astype(x_seq.dtype), cast(dds_s_f, ds_s),
            cast(dds_b_f, ds_b), dwin, dgrid, cast(dlw, lstm_w),
            cast(dlb, lstm_b), dh0, dc0)


fused_stage_scan_train.defvjp(_scan_fwd_rule, _scan_bwd_rule)


def train_stage_mode(H: int, W: int, C: int, part: Tuple[int, int], *,
                     scan: bool = False) -> str | None:
    """'part' | 'dense' | 'split' | None for the train kernels. The
    whole-stage backward kernel holds one block's stored intermediates +
    f32 weight-grad accumulators; its envelope mirrors the serving
    stage-scan bound (512k elements/image).

    ``scan``: the whole-window path additionally supports 'split' for
    gen4-stage-1-class stages (512k < elements <= 1M, same bound as the
    serving split mode): the attention pair trains as a batched
    custom-VJP kernel over all T*B frames (``fused_pair_train`` — it has
    no time recurrence) and the ConvLSTM as a whole-window scan kernel
    with the (dh, dc) BPTT carry in VMEM (``fused_lstm_scan_train``)."""
    per_image = H * W * C
    # f32 weight-grad accumulators: 2 blocks (qkv + proj + fc1 + fc2) +
    # the LSTM matmul
    grad_bytes = 4 * (2 * (3 * C * C + C * C + 8 * C * C) + 8 * C * C)
    act_bytes = 30 * per_image
    if grad_bytes + act_bytes <= 56 * 2 ** 20 and per_image <= _SPLIT_MIN:
        if partition_geometry_ok(H, W, C, part):
            return "part"
        if dense_attention_ok(H, W):
            return "dense"
        return None
    if (scan and per_image <= _SPLIT_MAX
            and partition_geometry_ok(H, W, C, part)):
        return "split"
    return None


# ---------------------------------------------------------------------------
# 'split' train mode: batched attention-pair custom-VJP + whole-window
# ConvLSTM scan custom-VJP (gen4-stage-1-class geometry, 512k-1M
# elements/image — the one-kernel whole-stage scan reproducibly OOM-kills
# the Mosaic compile there, exactly as on the serving side)
# ---------------------------------------------------------------------------

# envelope bounds, module-level so tests can force the split path at tiny
# geometries (the split composition is exercised end-to-end on CPU in
# interpret mode; the real gen4 geometry is verified on-chip by
# tools/verify_tpu_kernels.py)
_SPLIT_MIN = 512 * 1024
_SPLIT_MAX = 1024 * 1024

# row-slab size (elements) for the LSTM scan train kernels — the cell is
# token-pointwise, so slab splitting is exact (same rule as the serving
# fused_lstm_scan)
_TRAIN_SLAB_ELEMS = 512 * 1024


def _pair_fwd_win_kernel(*refs, H, W, C, heads, dh, part, eps, ds_eps,
                         dense, ds_ln=True):
    """Split-mode pair forward 1 of 2: downsample LN + window block.
    refs in: x (bf16 img), ds_s, ds_b, *win(12), [bias_w]
    refs out: R1 (f32 img) — the inter-block residual, saved as the VJP
    checkpoint so the backward skips one recompute."""
    x_ref, ds_s, ds_b = refs[:3]
    win = refs[3:3 + _N_TRAIN_SFN]
    bias_w = refs[3 + _N_TRAIN_SFN] if dense else None
    R1_ref = refs[-1]
    xf = x_ref[0].astype(jnp.float32)
    R1, _, _, _ = _recompute_R1(xf, ds_s, ds_b, win, H=H, W=W, C=C,
                                heads=heads, dh=dh, part=part, eps=eps,
                                ds_eps=ds_eps, bias_w=bias_w, ds_ln=ds_ln)
    R1_ref[0] = R1.reshape(R1_ref.shape[1:])


def _pair_fwd_grid_kernel(*refs, H, W, C, heads, dh, part, eps, dense):
    """Split-mode pair forward 2 of 2: grid block.
    refs in: R1 (f32 img), *grid(14), [bias_g]; refs out: R2 (f32 img).
    R2 stays f32 so the downstream LSTM-scan VJP's dR2 cotangent crosses
    the custom_vjp boundary unrounded (the one-kernel path passes it f32
    through HBM the same way)."""
    R1_ref = refs[0]
    grid_p = refs[1:1 + _N_TRAIN]
    bias_g = refs[1 + _N_TRAIN] if dense else None
    R2_ref = refs[-1]
    R1 = R1_ref[0].astype(jnp.float32)
    R2, _ = _block_fwd(R1, grid_p, window_mode=False, skip_first_norm=False,
                       x_in_bf16=None, H=H, W=W, C=C, heads=heads, dh=dh,
                       part=part, eps=eps, bias=bias_g, store=False)
    R2_ref[0] = R2.reshape(R2_ref.shape[1:])


def _pair_specs(cfg, x):
    """Shared BlockSpec/shape plumbing for the pair train kernels."""
    heads, dim_head, part, eps, ds_eps, dense, interpret, _ = _parse_cfg(cfg)
    N, H, W, C = x.shape
    if dense:
        Tk = H * W
        img = pl.BlockSpec((1, Tk, C), lambda n: (n, 0, 0),
                           memory_space=pltpu.VMEM)
        ishape = (N, Tk, C)
        bias_w = (partition_bias(H, W, part, True),)
        bias_g = (partition_bias(H, W, part, False),)
        x_in = x.reshape(ishape)
    else:
        img = pl.BlockSpec((1, H, W, C), lambda n: (n, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        ishape = (N, H, W, C)
        bias_w = bias_g = ()
        x_in = x
    return N, H, W, C, img, ishape, bias_w, bias_g, x_in


def _pair_vmem(H, W, C):
    """Scoped-VMEM cap for the split pair kernels, geometry-scaled like
    the serving scan (gen4 stage 1's f32 intermediates + one block's
    stores need the large cap; verified lowered on v5e)."""
    return pltpu.CompilerParams(
        vmem_limit_bytes=(100 if H * W * C > 512 * 1024 else 64)
        * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_pair_train(cfg, x, ds_s, ds_b, win, grid):
    """Downsample LN + MaxViT attention pair over N independent frames
    (the whole T*B window flattened — the pair has no time recurrence) as
    two Pallas kernels with a fused Pallas VJP.

    cfg: hashable (heads, dim_head, part, eps, ds_eps, dense, interpret).
    x: [N, H, W, C] bf16 raw downsample-conv output; win/grid:
    train-layout param tuples (``train_block_params``).
    Returns R2 [N, H, W, C] f32 (the ConvLSTM input)."""
    y, _ = _pair_fwd_call(cfg, x, ds_s, ds_b, win, grid)
    return y


def _pair_fwd_call(cfg, x, ds_s, ds_b, win, grid):
    (heads, dim_head, part, eps, ds_eps, dense, interpret,
     ds_ln) = _parse_cfg(cfg)
    N, H, W, C, img, ishape, bias_w, bias_g, x_in = _pair_specs(cfg, x)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fimg = jax.ShapeDtypeStruct(ishape, jnp.float32)
    vmem = _pair_vmem(H, W, C)
    k_win = functools.partial(
        _pair_fwd_win_kernel, H=H, W=W, C=C, heads=heads, dh=dim_head,
        part=part, eps=eps, ds_eps=ds_eps, dense=dense, ds_ln=ds_ln)
    R1 = pl.pallas_call(
        k_win, grid=(N,),
        in_specs=[img] + [full] * (2 + len(win) + len(bias_w)),
        out_specs=img, out_shape=fimg, compiler_params=vmem,
        interpret=interpret,
    )(x_in, ds_s, ds_b, *win, *bias_w)
    k_grid = functools.partial(
        _pair_fwd_grid_kernel, H=H, W=W, C=C, heads=heads, dh=dim_head,
        part=part, eps=eps, dense=dense)
    R2 = pl.pallas_call(
        k_grid, grid=(N,),
        in_specs=[img] + [full] * (len(grid) + len(bias_g)),
        out_specs=img, out_shape=fimg, compiler_params=vmem,
        interpret=interpret,
    )(R1, *grid, *bias_g)
    if dense:
        return R2.reshape(N, H, W, C), R1
    return R2, R1


def _pair_fwd_rule(cfg, x, ds_s, ds_b, win, grid):
    y, R1 = _pair_fwd_call(cfg, x, ds_s, ds_b, win, grid)
    return y, (x, ds_s, ds_b, win, grid, R1)


def _pair_bwd_rule(cfg, res, dy):
    """Two chained Pallas kernels — the per-frame grid/window block
    backwards shared with the whole-stage path (``_bwd_grid_kernel``,
    ``_bwd_window_kernel``), gridded over all N frames."""
    (heads, dim_head, part, eps, ds_eps, dense, interpret,
     ds_ln) = _parse_cfg(cfg)
    x, ds_s, ds_b, win, grid, R1 = res
    N, H, W, C, img, ishape, bias_w, bias_g, x_in = _pair_specs(cfg, x)
    dy_in = dy.reshape(ishape)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fimg = jax.ShapeDtypeStruct(ishape, jnp.float32)
    vmem = _pair_vmem(H, W, C)
    gshape = lambda ps: tuple(
        jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in ps)

    k2 = functools.partial(
        _bwd_grid_kernel, H=H, W=W, C=C, heads=heads, dh=dim_head,
        part=part, eps=eps, dense=dense)
    outs2 = pl.pallas_call(
        k2, grid=(N,),
        in_specs=[img] + [full] * (len(grid) + len(bias_g)) + [img],
        out_specs=(img,) + (full,) * len(grid),
        out_shape=(fimg,) + gshape(grid),
        compiler_params=vmem, interpret=interpret,
    )(R1, *grid, *bias_g, dy_in)
    dR1 = outs2[0]
    dgrid_f = outs2[1:]

    k3 = functools.partial(
        _bwd_window_kernel, H=H, W=W, C=C, heads=heads, dh=dim_head,
        part=part, eps=eps, ds_eps=ds_eps, dense=dense, ds_ln=ds_ln)
    outs3 = pl.pallas_call(
        k3, grid=(N,),
        in_specs=[img, full, full] + [full] * (len(win) + len(bias_w))
        + [img],
        out_specs=(img, full, full) + (full,) * len(win),
        out_shape=(jax.ShapeDtypeStruct(ishape, jnp.bfloat16),)
        + gshape((ds_s, ds_b)) + gshape(win),
        compiler_params=vmem, interpret=interpret,
    )(x_in, ds_s, ds_b, *win, *bias_w, dR1)
    dx = outs3[0].reshape(x.shape)
    cast = lambda g, p: g.astype(p.dtype)
    dwin = tuple(cast(g, p) for g, p in zip(outs3[3:], win))
    dgrid = tuple(cast(g, p) for g, p in zip(dgrid_f, grid))
    return (dx.astype(x.dtype), cast(outs3[1], ds_s), cast(outs3[2], ds_b),
            dwin, dgrid)


fused_pair_train.defvjp(_pair_fwd_rule, _pair_bwd_rule)


def _lstm_scan_fwd_train_kernel(x_ref, w_ref, b_ref, h0_ref, c0_ref,
                                hseq_ref, cseq_ref, hT_ref, cT_ref,
                                h_s, c_s, *, C: int):
    """Whole-window ConvLSTM forward over one row-slab: grid (B, S, T)
    with t innermost, carry in VMEM scratch. Same numerics as the serving
    ``fused_scan._lstm_scan_kernel``; additionally streams c_seq (f32) —
    together with the bf16 h_seq output these are exactly the per-step
    carry INPUTS the backward needs."""
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        h_s[...] = h0_ref[0]
        c_s[...] = c0_ref[0]

    Hs, W = x_ref.shape[2], x_ref.shape[3]
    T = Hs * W
    _, _, _, _, _, _, c_t, h_t = _lstm_recompute(
        x_ref[0, 0], h_s[...], c_s[...], w_ref, b_ref, T, C)
    h_s[...] = h_t.reshape(Hs, W, C)
    c_s[...] = c_t.reshape(Hs, W, C)
    hseq_ref[0, 0] = h_s[...].astype(jnp.bfloat16)
    cseq_ref[0, 0] = c_s[...]
    # constant block index over t: the final write (t = T-1) is what lands
    hT_ref[0] = h_s[...]
    cT_ref[0] = c_s[...]


def _lstm_scan_bwd_kernel(x_ref, w_ref, b_ref, hp_ref, cp_ref, dhs_ref,
                          dhT_ref, dcT_ref, dx_ref, dlw_ref, dlb_ref,
                          dh0_ref, dc0_ref, dh_s, dc_s, *, C: int):
    """Whole-window ConvLSTM backward: grid (B, S, T) whose seq index maps
    run time REVERSED (grid position t processes actual step T-1-t); the
    (dh, dc) BPTT carry lives in VMEM scratch per (b, slab).
    refs in: x_seq (R2 stream), lstm_w, lstm_b, h_prev_seq (bf16),
    c_prev_seq (f32), dh_seq (bf16 cotangent of h_seq), dhT, dcT
    refs out: dx_seq (f32), dlstm_w, dlstm_b, dh0, dc0."""
    b = pl.program_id(0)
    s = pl.program_id(1)
    tr = pl.program_id(2)

    @pl.when(tr == 0)
    def _init():
        dh_s[...] = dhT_ref[0]
        dc_s[...] = dcT_ref[0]

    Hs, W = x_ref.shape[2], x_ref.shape[3]
    T = Hs * W
    # carried recurrent cotangent + this step's external (h_seq) cotangent
    dh_full = (dh_s[...].reshape(T, C)
               + dhs_ref[0, 0].astype(jnp.float32).reshape(T, C))
    dlw_acc, dlb_acc, dx, dhin, dcin = _lstm_bwd_chunked(
        x_ref[0, 0].astype(jnp.bfloat16).reshape(T, C),
        hp_ref[0, 0].reshape(T, C),
        cp_ref[0, 0].reshape(T, C),
        dh_full, dc_s[...].reshape(T, C), w_ref, b_ref, T, C)
    first = jnp.logical_and(jnp.logical_and(b == 0, s == 0), tr == 0)
    _acc(dlw_ref, first, dlw_acc)
    _acc(dlb_ref, first, dlb_acc)
    dx_ref[0, 0] = dx.reshape(Hs, W, C)
    dh_s[...] = dhin.reshape(Hs, W, C)
    dc_s[...] = dcin.reshape(Hs, W, C)
    # constant block over t: the last write (tr = T-1, actual step 0) lands
    dh0_ref[0] = dh_s[...]
    dc0_ref[0] = dc_s[...]


def _lstm_slab_split(H: int, W: int, C: int) -> int:
    rows_split = 1
    while (H % (rows_split * 2) == 0
           and (H // rows_split) * W * C > _TRAIN_SLAB_ELEMS):
        rows_split *= 2
    return rows_split


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_lstm_scan_train(interpret, x_seq, lstm_w, lstm_b, h0, c0):
    """Whole-window ConvLSTM scan (carry in VMEM, row-slab split) with a
    fused Pallas VJP — the recurrence half of the 'split' train mode.

    x_seq: [T, B, H, W, C] f32 attention-pair outputs (R2); h0/c0 f32.
    Returns (h_seq [T, B, H, W, C] bf16, h_T f32, c_T f32). Numerics match
    the one-kernel stage scan bit-for-bit (the cell consumes R2 cast to
    bf16 either way)."""
    h_seq, _, hT, cT = _lstm_scan_train_call(interpret, x_seq, lstm_w,
                                             lstm_b, h0, c0)
    return h_seq, hT, cT


def _lstm_scan_train_call(interpret, x_seq, lstm_w, lstm_b, h0, c0):
    T, B, H, W, C = x_seq.shape
    S = _lstm_slab_split(H, W, C)
    Hs = H // S
    seq = pl.BlockSpec((1, 1, Hs, W, C), lambda b, s, t: (t, b, s, 0, 0),
                       memory_space=pltpu.VMEM)
    img = pl.BlockSpec((1, Hs, W, C), lambda b, s, t: (b, s, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_lstm_scan_fwd_train_kernel, C=C)
    return pl.pallas_call(
        kernel,
        grid=(B, S, T),
        in_specs=[seq, full, full, img, img],
        out_specs=(seq, seq, img, img),
        out_shape=(jax.ShapeDtypeStruct((T, B, H, W, C), jnp.bfloat16),
                   jax.ShapeDtypeStruct((T, B, H, W, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, W, C), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((Hs, W, C), jnp.float32),
                        pltpu.VMEM((Hs, W, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_seq, lstm_w, lstm_b, h0, c0)


def _lstm_scan_train_fwd(interpret, x_seq, lstm_w, lstm_b, h0, c0):
    h_seq, c_seq, hT, cT = _lstm_scan_train_call(interpret, x_seq, lstm_w,
                                                 lstm_b, h0, c0)
    return (h_seq, hT, cT), (x_seq, lstm_w, lstm_b, h0, c0, h_seq, c_seq)


def _lstm_scan_train_bwd(interpret, res, cot):
    x_seq, lstm_w, lstm_b, h0, c0, h_seq, c_seq = res
    dh_seq, dhT, dcT = cot
    T, B, H, W, C = x_seq.shape
    S = _lstm_slab_split(H, W, C)
    Hs = H // S
    # per-step carry INPUTS: what step t consumed is the step t-1 state
    # (bf16 h is exactly the rounding the kernel applies to its carry)
    h_prev = jnp.concatenate([h0.astype(jnp.bfloat16)[None], h_seq[:-1]],
                             axis=0)
    c_prev = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)
    seq_r = pl.BlockSpec((1, 1, Hs, W, C),
                         lambda b, s, t, T=T: (T - 1 - t, b, s, 0, 0),
                         memory_space=pltpu.VMEM)
    img = pl.BlockSpec((1, Hs, W, C), lambda b, s, t: (b, s, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_lstm_scan_bwd_kernel, C=C)
    dx, dlw, dlb, dh0, dc0 = pl.pallas_call(
        kernel,
        grid=(B, S, T),
        in_specs=[seq_r, full, full, seq_r, seq_r, seq_r, img, img],
        out_specs=(seq_r, full, full, img, img),
        out_shape=(jax.ShapeDtypeStruct((T, B, H, W, C), jnp.float32),
                   jax.ShapeDtypeStruct(lstm_w.shape, jnp.float32),
                   jax.ShapeDtypeStruct(lstm_b.shape, jnp.float32),
                   jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, W, C), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((Hs, W, C), jnp.float32),
                        pltpu.VMEM((Hs, W, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_seq, lstm_w, lstm_b, h_prev, c_prev,
      dh_seq.astype(jnp.bfloat16), dhT.astype(jnp.float32),
      dcT.astype(jnp.float32))
    return (dx.astype(x_seq.dtype), dlw.astype(lstm_w.dtype),
            dlb.astype(lstm_b.dtype), dh0, dc0)


fused_lstm_scan_train.defvjp(_lstm_scan_train_fwd, _lstm_scan_train_bwd)


def split_stage_scan_train(cfg, x_seq, ds_s, ds_b, win, grid, lstm_w,
                           lstm_b, h0, c0):
    """'split' TRAIN mode for stages beyond the one-kernel envelope (gen4
    stage 1): the attention pair — no time recurrence — trains as one
    batched custom-VJP launch pair over all T*B frames, then the ConvLSTM
    trains as a whole-window scan with the BPTT carry in VMEM. Training
    twin of the serving ``fused_scan.split_stage_scan``; forward is
    bitwise-equal to ``fused_stage_scan_train`` (same kernel bodies, f32
    R2 handoff through HBM).

    cfg/args as ``fused_stage_scan_train``. Returns (h_seq bf16, hT f32,
    cT f32)."""
    interpret = _parse_cfg(cfg)[6]
    T, B, H, W, C = x_seq.shape
    y = fused_pair_train(cfg, x_seq.reshape(T * B, H, W, C), ds_s, ds_b,
                         win, grid)
    return fused_lstm_scan_train(interpret, y.reshape(T, B, H, W, C),
                                 lstm_w, lstm_b, h0, c0)

