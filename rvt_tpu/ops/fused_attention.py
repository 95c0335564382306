"""Fused MaxViT partition-attention block as a single Pallas TPU kernel.

One ``PartitionAttention`` block (models/layers.py:202-247; reference
``maxvit.py:185-270``) is, on the XLA path, ~20 HBM-roundtrip fusions per
scan step: LN stat reduces in awkward layouts, qkv head-layout copies,
f32 softmax materialisation, LayerScale/residual convert chains. On a v5e
this chain — not the matmuls — dominates streaming inference (see
docs/PERF.md). This kernel runs the whole block per batch image with every
intermediate VMEM-resident:

    [LN1] -> window/grid partition -> qkv -> per-head attention
    (f32 softmax) -> proj -> LayerScale -> +residual
    -> LN2 -> MLP (fc1/gelu/fc2) -> LayerScale -> +residual

Numerics mirror the XLA path: matmuls in bf16 with f32 accumulation, LN
statistics and softmax in f32, LayerScale and residual accumulation in f32
(flax promotes bf16*f32 gamma to f32), output f32. Grid = (batch,); weights
use constant index maps so Mosaic keeps them VMEM-resident across programs.

Supported config envelope (the shipped RVT configs): non-gated MLP,
attention/MLP bias on, LayerScale active, no DropPath/dropout,
deterministic (serving) mode. The flax module falls back to the XLA path
otherwise (models/layers.py).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# matmul settings inside the kernel: bf16 operands, f32 accumulation.
# precision=DEFAULT overrides the global f32 matmul-precision pin
# (rvt_tpu/__init__.py) which Mosaic rejects for bf16 operands.
_DOT = dict(preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)


def _layer_norm_f32(x_f32: Array, scale_bf16: Array, bias_bf16: Array,
                    eps: float) -> Array:
    """flax LayerNorm semantics: f32 stats (fast variance), scale/bias
    applied after casting to the compute dtype, result cast to bf16."""
    mu = jnp.mean(x_f32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (x_f32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale_bf16.astype(jnp.float32) + bias_bf16.astype(jnp.float32)
    return y.astype(jnp.bfloat16)


def _erf_f32(x: Array) -> Array:
    """erf for the Mosaic kernel (lax.erf has no Pallas TPU lowering).
    Abramowitz & Stegun 7.1.26 rational approximation: max abs error
    1.5e-7 — two decades below bf16 resolution, so gelu output is
    bit-identical after the bf16 cast for all practical inputs."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x_bf16: Array) -> Array:
    xf = x_bf16.astype(jnp.float32)
    y = xf * (_erf_f32(xf * (2.0 ** -0.5)) + 1.0) * 0.5
    return y.astype(jnp.bfloat16)


def _attention_block_kernel(*refs, H: int, W: int, C: int, heads: int,
                            dim_head: int, part: Tuple[int, int],
                            window_mode: bool, skip_first_norm: bool,
                            eps: float):
    if skip_first_norm:
        (x_ref, qkv_w, qkv_b, proj_w, proj_b, g1, ln2_s, ln2_b,
         fc1_w, fc1_b, fc2_w, fc2_b, g2, o_ref) = refs
        ln1_s = ln1_b = None
    else:
        (x_ref, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, g1, ln2_s, ln2_b,
         fc1_w, fc1_b, fc2_w, fc2_b, g2, o_ref) = refs

    ph, pw = part
    nh, nw = H // ph, W // pw
    n_tokens = ph * pw
    n_parts = nh * nw
    T = H * W
    dh = dim_head

    R = x_ref[0].astype(jnp.float32)  # residual accumulator [H, W, C]

    # ---- attention sub-block -------------------------------------------
    if skip_first_norm:
        xa = x_ref[0].astype(jnp.bfloat16)
    else:
        xa = _layer_norm_f32(R, ln1_s[...], ln1_b[...], eps)

    if window_mode:
        # [H, W, C] -> [nh, ph, nw, pw, C] -> [nh, nw, ph, pw, C]
        p = xa.reshape(nh, ph, nw, pw, C).transpose(0, 2, 1, 3, 4)
    else:
        # grid: [gh, nh, gw, nw, C] -> [nh, nw, gh, gw, C]
        p = xa.reshape(ph, nh, pw, nw, C).transpose(1, 3, 0, 2, 4)
    tokens = p.reshape(n_parts * n_tokens, C)

    qkv = jax.lax.dot_general(tokens, qkv_w[...],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              **_DOT).astype(jnp.bfloat16) + qkv_b[...]
    qkv = qkv.reshape(n_parts, n_tokens, 3 * C)
    # Per-head attention via static lane slices (the packed layout is
    # [head0: q|k|v, head1: q|k|v, ...], 3*dh lanes per head) — Mosaic
    # cannot lane-split reshapes, so heads are unrolled.
    head_outs = []
    for i in range(heads):
        base = i * 3 * dh
        q = qkv[:, :, base:base + dh]
        k = qkv[:, :, base + dh:base + 2 * dh]
        v = qkv[:, :, base + 2 * dh:base + 3 * dh]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), **_DOT)
        probs = jax.nn.softmax(scores * (dh ** -0.5),
                               axis=-1).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))), **_DOT)
        head_outs.append(o.astype(jnp.bfloat16))
    out = jnp.concatenate(head_outs, axis=-1)  # [nP, N, C]

    out = out.reshape(n_parts * n_tokens, C)
    out = jax.lax.dot_general(out, proj_w[...],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              **_DOT).astype(jnp.bfloat16) + proj_b[...]

    out = out.reshape(n_parts, n_tokens, C)
    if window_mode:
        out = out.reshape(nh, nw, ph, pw, C).transpose(0, 2, 1, 3, 4)
    else:
        out = out.reshape(nh, nw, ph, pw, C).transpose(2, 0, 3, 1, 4)
    out = out.reshape(H, W, C)
    R = R + out.astype(jnp.float32) * g1[...].astype(jnp.float32)

    # ---- MLP sub-block --------------------------------------------------
    y = _layer_norm_f32(R, ln2_s[...], ln2_b[...], eps).reshape(T, C)
    y = jax.lax.dot_general(y, fc1_w[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            **_DOT).astype(jnp.bfloat16) + fc1_b[...]
    y = _gelu_exact(y)
    y = jax.lax.dot_general(y, fc2_w[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            **_DOT).astype(jnp.bfloat16) + fc2_b[...]
    y = y.reshape(H, W, C)
    R = R + y.astype(jnp.float32) * g2[...].astype(jnp.float32)

    o_ref[0] = R


@functools.partial(
    jax.jit,
    static_argnames=("heads", "dim_head", "part", "window_mode",
                     "skip_first_norm", "eps", "interpret"))
def fused_partition_attention(x: Array, params: Tuple[Array, ...], *,
                              heads: int, dim_head: int,
                              part: Tuple[int, int], window_mode: bool,
                              skip_first_norm: bool, eps: float,
                              interpret: bool = False) -> Array:
    """Run one PartitionAttention block fused. x: [B, H, W, C] (bf16 or
    f32); params: the flat tuple documented in ``attention_block_params``.
    Returns f32 [B, H, W, C] (the residual stream, matching the XLA path's
    promoted dtype)."""
    B, H, W, C = x.shape
    kernel = functools.partial(
        _attention_block_kernel, H=H, W=W, C=C, heads=heads,
        dim_head=dim_head, part=part, window_mode=window_mode,
        skip_first_norm=skip_first_norm, eps=eps)
    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in params]
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + param_specs,
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        interpret=interpret,
    )(x, *params)


def attention_block_params(p: dict, skip_first_norm: bool
                           ) -> Tuple[Array, ...]:
    """Flatten one PartitionAttention param subtree (flax layout, master
    f32) into the kernel's argument tuple, pre-cast exactly as the XLA
    path's modules would (weights/LN affine -> bf16, LayerScale -> f32)."""
    # 1-D vectors are reshaped to (1, dim): Mosaic vector layouts are 2-D.
    bf = lambda a: jnp.asarray(a, jnp.bfloat16).reshape(1, -1)
    bfw = lambda a: jnp.asarray(a, jnp.bfloat16)
    f32 = lambda a: jnp.asarray(a, jnp.float32).reshape(1, -1)
    out = []
    if not skip_first_norm:
        out += [bf(p["norm1"]["scale"]), bf(p["norm1"]["bias"])]
    attn = p["self_attn"]
    out += [bfw(attn["qkv"]["kernel"]), bf(attn["qkv"]["bias"]),
            bfw(attn["proj"]["kernel"]), bf(attn["proj"]["bias"]),
            f32(p["ls1"]["gamma"]),
            bf(p["norm2"]["scale"]), bf(p["norm2"]["bias"]),
            bfw(p["mlp"]["fc1"]["kernel"]), bf(p["mlp"]["fc1"]["bias"]),
            bfw(p["mlp"]["fc2"]["kernel"]), bf(p["mlp"]["fc2"]["bias"]),
            f32(p["ls2"]["gamma"])]
    return tuple(out)
