"""Fused MaxViT attention as Pallas TPU kernels.

A MaxViT block pair (window attention + MLP, then grid attention + MLP;
models/layers.py, reference ``maxvit.py:185-270`` / ``maxvit_rnn.py:108``)
is, on the XLA path, ~40 HBM-roundtrip fusions per scan step: LN stat
reduces in awkward layouts, qkv head-layout copies, f32 softmax
materialisation, LayerScale/residual convert chains. On a v5e this chain —
not the matmuls — dominates streaming inference (docs/PERF.md). Here the
whole pair runs as ONE kernel per batch image with every intermediate
VMEM-resident:

    [LN] -> window partition -> qkv -> per-head attention (f32 softmax)
    -> proj -> LayerScale -> +residual -> LN -> MLP -> LS -> +residual
    -> LN -> grid partition -> ... same ... -> +residual

Mosaic-shaped choices (each probed on real v5e hardware):
  * heads are unrolled with static lane slices — Mosaic cannot lane-split
    reshapes ([T, 3C] -> [T, h, 3dh]) or i1 shape-casts,
  * scores are computed TRANSPOSED, ``k @ q^T`` -> [parts, N_k, N_q], so
    the softmax reduction runs over sublanes instead of lanes (~2x faster
    on the VPU for these 80-token partitions),
  * matmuls run with ``precision=DEFAULT`` — the global f32
    matmul-precision pin (rvt_tpu/__init__.py) is for checkpoint-parity of
    f32 convs and makes Mosaic reject bf16 operands,
  * LN statistics, softmax, LayerScale and the residual stream are f32,
    matching the XLA path's dtype promotion exactly.

When both sub-blocks' weights don't fit VMEM together (stage 4, C=512)
the pair is executed as two single-block kernels; when even one block's
working set exceeds VMEM (gen4 stage 1 spatial size) the flax module
falls back to the XLA path entirely (models/layers.py).

Serving-only: the kernels define no VJP; training and module init always
take the XLA path.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_DOT = dict(preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
# NOTE: preferred_element_type=bfloat16 was tried for the bf16-out dots
# (it would skip the f32->bf16 VPU pass) but Mosaic rejects it:
# "'tpu.matmul' op Expected matmul acc to be 32-bit". All dots therefore
# accumulate to f32 and round explicitly.

# params per sub-block: [ln1_s, ln1_b] (absent when skip_first_norm),
# qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b.
# The LayerScale gammas are folded into proj/fc2 weights+biases at
# flatten time (attention_block_params), saving one full-tensor f32
# multiply per sub-block half.
_N_PARAMS = 12
_N_PARAMS_SFN = 10


def partition_geometry_ok(H: int, W: int, C: int,
                          part: Tuple[int, int]) -> bool:
    """Mosaic shape-cast envelope for the *partitioned* attention path.

    The partition reshapes split the W (second-minor) dim, whose rows
    pack with the lane dim C into bf16 (16, 128) tiles — two W-rows per
    32-bit sublane. Mosaic's infer-vector-layout supports the split when
    each minor chunk is a whole number of packed sublanes (minor even)
    covering at least one 128-lane tile (minor * C >= 128), or the split
    is trivial. Empirical envelope, probed lowered on v5e (every row
    matches this rule; odd minors and sub-tile chunks are the rejects):

      W=80 ->(8,10)  C=32..64   lowers   W=160 ->(16,10) C=64  lowers
      W=40 ->(10,4)  C=128      lowers   W=20  ->(10,2)  C=256 lowers
      W=20 ->(2,10)  C=512      lowers   W=10  ->(10,1)  C=512 lowers
      W=24 ->(8,3)   C=32   REJECTED ("unsupported shape cast")
      W=48 ->(16,3)  C=64   REJECTED (odd minor, even though 3*64 > 128)

    Geometries outside this envelope use the masked-dense path instead
    (see ``dense_attention_ok``)."""
    ph, pw = part
    if H % ph or W % pw:
        return False
    nh, nw = H // ph, W // pw

    def split_ok(outer: int, minor: int) -> bool:
        return (outer == 1 or minor == 1
                or (minor % 2 == 0 and minor * C >= 128))

    return (split_ok(nw, pw)            # window mode: W -> (nw, pw)
            and split_ok(pw, nw)        # grid mode:   W -> (pw, nw)
            and ph * pw >= 8)           # tokens sublane dim -> (parts, N)


def dense_attention_ok(H: int, W: int) -> bool:
    """Envelope for the masked-dense path: the [T, T] per-head score
    tensor must stay small (f32 scores <= 4 MB)."""
    return H * W <= 1024


def partition_bias(H: int, W: int, part: Tuple[int, int],
                   window_mode: bool) -> Array:
    """[T, T] additive attention-bias mask for the masked-dense path:
    0 where tokens share a partition, -1e30 otherwise. Token order is
    row-major (no reordering happens in dense mode); bf16 keeps VMEM
    small (the f32 range of the exponent makes -1e30 exact enough)."""
    import numpy as np

    ph, pw = part
    ids = np.arange(H * W)
    r, c = ids // W, ids % W
    if window_mode:
        pid = (r // ph) * (W // pw) + (c // pw)
    else:
        # grid partition: same partition iff same (r % nh, c % nw),
        # see models/layers.py:grid_partition
        nh, nw = H // ph, W // pw
        pid = (r % nh) * nw + (c % nw)
    mask = pid[:, None] == pid[None, :]
    return jnp.asarray(np.where(mask, 0.0, -1e30), jnp.bfloat16)


def _layer_norm_f32(x_f32: Array, scale_bf16: Array, bias_bf16: Array,
                    eps: float) -> Array:
    """flax LayerNorm semantics: f32 stats (fast variance), affine applied
    in f32, result cast to bf16."""
    mu = jnp.mean(x_f32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (x_f32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale_bf16.astype(jnp.float32) + bias_bf16.astype(jnp.float32)
    return y.astype(jnp.bfloat16)


def _gelu(x_bf16: Array) -> Array:
    """gelu for Mosaic (lax.erf has no Pallas TPU lowering). The tanh
    formulation (one hardware transcendental + 7 VPU ops, vs ~22 for an
    erf rational approximation) deviates from exact-erf gelu by < 1.1e-3
    absolute — a few bf16 ULPs in the negative tail (near x~=-2,
    |gelu|~=0.045 where a bf16 ULP is ~3.5e-4), exact to the last bit
    over most of the active range. The end-to-end impact is bounded by
    the model parity tolerance (rtol 1e-3) and ultimately by the mAP
    gate. The VPU time this buys is ~100 us per stage-1 kernel
    invocation (gelu runs on the 4x expanded MLP hidden, the largest
    tensor in the block)."""
    xf = x_bf16.astype(jnp.float32)
    inner = 0.7978845608028654 * (xf + 0.044715 * xf * xf * xf)
    y = 0.5 * xf * (1.0 + jnp.tanh(inner))
    return y.astype(jnp.bfloat16)


def _one_block(R: Array, prm: Sequence[Array], *, window_mode: bool,
               skip_first_norm: bool, x_in_bf16: Array, H: int, W: int,
               C: int, heads: int, dh: int, part: Tuple[int, int],
               eps: float, bias=None) -> Array:
    """One PartitionAttention sub-block on the f32 residual R. Returns the
    updated residual. ``x_in_bf16`` is only used when skip_first_norm (the
    downsample's LN output enters attention unnormalised).

    ``bias=None``: the partitioned path — R is [H, W, C] and tokens are
    gathered per partition via reshape/transpose (requires
    ``partition_geometry_ok``). ``bias`` set (a [T, T] bf16 ref): the
    masked-dense path — R is [T, C], attention runs over ALL tokens with
    the partition structure imposed by the additive bias (0 within a
    partition, -1e30 across). Same math, no W-dim shape casts — this is
    how small/nonstandard geometries (whose partition chunks Mosaic
    cannot lane-split) stay fused."""
    ph, pw = part
    nh, nw = H // ph, W // pw
    n_tokens = ph * pw
    n_parts = nh * nw
    T = H * W
    dense = bias is not None
    i = 0
    if skip_first_norm:
        xa = x_in_bf16
    else:
        xa = _layer_norm_f32(R, prm[0][...], prm[1][...], eps)
        i = 2
    (qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
     fc1_w, fc1_b, fc2_w, fc2_b) = prm[i:i + 10]

    if dense:
        tokens = xa  # [T, C], row-major — no reordering in dense mode
    else:
        if window_mode:
            p = xa.reshape(nh, ph, nw, pw, C).transpose(0, 2, 1, 3, 4)
        else:
            p = xa.reshape(ph, nh, pw, nw, C).transpose(1, 3, 0, 2, 4)
        tokens = p.reshape(n_parts * n_tokens, C)

    qkv = jax.lax.dot_general(tokens, qkv_w[...],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              **_DOT).astype(jnp.bfloat16) + qkv_b[...]
    if not dense:
        qkv = qkv.reshape(n_parts, n_tokens, 3 * C)
    head_outs = []
    for h_i in range(heads):
        base = h_i * 3 * dh
        if dense:
            q = qkv[:, base:base + dh]
            k = qkv[:, base + dh:base + 2 * dh]
            v = qkv[:, base + 2 * dh:base + 3 * dh]
            # transposed scores [T_k, T_q] + partition mask bias; softmax
            # reduces over sublanes as in the partitioned path
            scores_t = jax.lax.dot_general(
                k, q, dimension_numbers=(((1,), (1,)), ((), ())), **_DOT)
            scores_t = (scores_t * (dh ** -0.5)
                        + bias[...].astype(jnp.float32))
            probs_t = jax.nn.softmax(scores_t, axis=0).astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                probs_t, v, dimension_numbers=(((0,), (0,)), ((), ())),
                **_DOT)
        else:
            q = qkv[:, :, base:base + dh]
            k = qkv[:, :, base + dh:base + 2 * dh]
            v = qkv[:, :, base + 2 * dh:base + 3 * dh]
            # transposed scores [nP, N_k, N_q]: softmax reduces over sublanes
            scores_t = jax.lax.dot_general(
                k, q, dimension_numbers=(((2,), (2,)), ((0,), (0,))), **_DOT)
            probs_t = jax.nn.softmax(scores_t * (dh ** -0.5),
                                     axis=1).astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                probs_t, v, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                **_DOT)
        head_outs.append(o.astype(jnp.bfloat16))
    out = jnp.concatenate(head_outs, axis=-1)  # [nP, N_q, C] / [T, C]

    if not dense:
        out = out.reshape(n_parts * n_tokens, C)
    out = jax.lax.dot_general(out, proj_w[...],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              **_DOT).astype(jnp.bfloat16) + proj_b[...]
    if not dense:
        out = out.reshape(n_parts, n_tokens, C)
        if window_mode:
            out = out.reshape(nh, nw, ph, pw, C).transpose(0, 2, 1, 3, 4)
        else:
            out = out.reshape(nh, nw, ph, pw, C).transpose(2, 0, 3, 1, 4)
        out = out.reshape(H, W, C)
    R = R + out.astype(jnp.float32)

    # The MLP is token-pointwise, so it runs in row chunks: the f32 gelu
    # intermediates over the 4x hidden are the kernel's VMEM peak (a full
    # [T, 4C] f32 tensor is 20 MB at gen4 stage-1 sizes). The 8 MB chunk
    # target keeps gen1 stage 1 monolithic (small-M matmuls pay MXU
    # startup overhead); gen4-sized images use 4 MB chunks — their qkv/
    # score tensors already push the stack near the 64 MB scoped cap.
    R2 = R.reshape(T, C)
    target = (4 if T * C > 512 * 1024 else 8) * 2 ** 20
    chunk = T
    while chunk * 4 * C * 4 > target and chunk % 2 == 0:
        chunk //= 2
    outs = []
    for s in range(0, T, chunk):
        y = _layer_norm_f32(R2[s:s + chunk], ln2_s[...], ln2_b[...], eps)
        y = jax.lax.dot_general(y, fc1_w[...],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                **_DOT).astype(jnp.bfloat16) + fc1_b[...]
        y = _gelu(y)
        y = jax.lax.dot_general(y, fc2_w[...],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                **_DOT).astype(jnp.bfloat16) + fc2_b[...]
        outs.append(y)
    y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    y = y if dense else y.reshape(H, W, C)
    return R + y.astype(jnp.float32)


def _blocks_kernel(*refs, blocks, H, W, C, heads, dh, part, eps, dense,
                   ds_ln, ds_eps):
    """blocks: sequence of (window_mode, skip_first_norm, n_params).
    With ``dense`` the last two param refs are the window/grid partition
    bias masks and the image block is [T, C]. With ``ds_ln`` the first
    two param refs are the downsample LayerNorm scale/bias, applied
    in-kernel (saves a standalone XLA LN pass over the whole window in
    the split serving mode — the C-lane reduce fuses badly out there)."""
    x_ref = refs[0]
    o_ref = refs[-1]
    if dense:
        bias_w, bias_g = refs[-3:-1]
        prms = refs[1:-3]
    else:
        bias_w = bias_g = None
        prms = refs[1:-1]
    if ds_ln:
        x_bf16 = _layer_norm_f32(x_ref[0].astype(jnp.float32),
                                 prms[0][...], prms[1][...], ds_eps)
        prms = prms[2:]
        R = x_bf16.astype(jnp.float32)
    else:
        x_bf16 = x_ref[0].astype(jnp.bfloat16)
        R = x_ref[0].astype(jnp.float32)
    off = 0
    for window_mode, sfn, n in blocks:
        R = _one_block(R, prms[off:off + n], window_mode=window_mode,
                       skip_first_norm=sfn, x_in_bf16=x_bf16, H=H, W=W,
                       C=C, heads=heads, dh=dh, part=part, eps=eps,
                       bias=(bias_w if window_mode else bias_g)
                       if dense else None)
        off += n
        x_bf16 = None  # only the first block may skip its input norm
    o_ref[0] = R


@functools.partial(
    jax.jit,
    static_argnames=("blocks", "heads", "dim_head", "part", "eps",
                     "dense", "ds_eps", "interpret"))
def fused_attention_blocks(x: Array, params: Tuple[Array, ...], *,
                           blocks: Tuple[Tuple[bool, bool, int], ...],
                           heads: int, dim_head: int,
                           part: Tuple[int, int], eps: float,
                           dense: bool = False,
                           ds_ln_params: Tuple[Array, ...] = (),
                           ds_eps: float = 1e-5,
                           interpret: bool = False) -> Array:
    """Run one or more PartitionAttention sub-blocks as a single fused
    kernel. x: [B, H, W, C] (bf16 or f32); params: concatenated per-block
    tuples (see ``attention_block_params``). Returns the f32 residual
    stream [B, H, W, C] (the XLA path's promoted dtype).

    ``dense`` selects the masked-dense small-geometry path (tokens stay
    [T, C] in-kernel, partition structure via additive masks).
    ``ds_ln_params`` = (scale, bias): the preceding downsample conv's
    LayerNorm runs in-kernel on the raw conv output (blocks[0] must then
    have skip_first_norm=True)."""
    B, H, W, C = x.shape
    kernel = functools.partial(
        _blocks_kernel, blocks=blocks, H=H, W=W, C=C, heads=heads,
        dh=dim_head, part=part, eps=eps, dense=dense,
        ds_ln=bool(ds_ln_params), ds_eps=ds_eps)
    params = tuple(ds_ln_params) + tuple(params)
    extra = ((partition_bias(H, W, part, True),
              partition_bias(H, W, part, False)) if dense else ())
    if dense:
        T = H * W
        x_in = x.reshape(B, T, C)
        img = pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, T, C), jnp.float32)
    else:
        x_in = x
        img = pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, H, W, C), jnp.float32)
    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)
                   for _ in range(len(params) + len(extra))]
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[img] + param_specs,
        out_specs=img,
        out_shape=out_shape,
        # gen1 stage-1's working set peaks just above the default 16 MB
        # scoped VMEM stack limit; gen4 stage-1 (96x160, 983k elements per
        # image) needs ~53 MB (f32 qkv accumulators + per-head score
        # tensors). Raise the cap accordingly — v5e has 128 MB of VMEM and
        # the grid is sequential over images, so only ~2 programs' blocks
        # are live alongside the stack.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(64 if H * W * C > 512 * 1024 else 32)
            * 1024 * 1024),
        interpret=interpret,
    )(x_in, *params, *extra)
    return out.reshape(B, H, W, C) if dense else out


def _stage_kernel(*refs, blocks, H, W, C, heads, dh, part, eps, dense):
    """Whole backbone stage: attention block chain + ConvLSTM cell in one
    kernel. refs: x, *attn_params, [bias_w, bias_g,] lstm_w, lstm_b,
    h_in, c_in -> h_out, c_out. The residual stream never leaves VMEM;
    LSTM numerics mirror ops/fused_lstm.py exactly (bf16 matmul/gates,
    f32 cell update)."""
    x_ref = refs[0]
    lstm_w, lstm_b, h_ref, c_ref = refs[-6:-2]
    ho_ref, co_ref = refs[-2:]
    if dense:
        bias_w, bias_g = refs[-8:-6]
        prms = refs[1:-8]
    else:
        bias_w = bias_g = None
        prms = refs[1:-6]
    R = x_ref[0].astype(jnp.float32)
    x_bf16 = x_ref[0].astype(jnp.bfloat16)
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
    hb = h_ref[0].astype(jnp.bfloat16).reshape(T, C)
    xh = jnp.concatenate([xb, hb], axis=-1)
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
    c_t = (forget_gate * c_ref[0].astype(jnp.float32).reshape(T, C)
           + input_gate * cell_input)
    h_t = output_gate * jnp.tanh(c_t)
    ho_ref[0] = h_t.reshape(H, W, C)
    co_ref[0] = c_t.reshape(H, W, C)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "dim_head", "part", "skip_first_norm",
                     "eps", "dense", "interpret"))
def fused_stage(x: Array, params_window: Tuple[Array, ...],
                params_grid: Tuple[Array, ...], lstm_w: Array,
                lstm_b: Array, h: Array, c: Array, *, heads: int,
                dim_head: int, part: Tuple[int, int],
                skip_first_norm: bool, eps: float, dense: bool = False,
                interpret: bool = False) -> Tuple[Array, Array]:
    """One whole backbone stage after the downsample — window+grid
    attention pair and the ConvLSTM cell — as a single kernel per image.
    Returns (h_t, c_t), both f32 [B, H, W, C]. Caller must have checked
    ``stage_fusion_mode``."""
    B, H, W, C = x.shape
    blocks = ((True, skip_first_norm,
               _N_PARAMS_SFN if skip_first_norm else _N_PARAMS),
              (False, False, _N_PARAMS))
    kernel = functools.partial(
        _stage_kernel, blocks=blocks, H=H, W=W, C=C, heads=heads,
        dh=dim_head, part=part, eps=eps, dense=dense)
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
    n_p = len(params_window) + len(params_grid) + len(extra)
    h_t, c_t = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[img] + [full] * n_p + [full, full, img, img],
        out_specs=(img, img),
        out_shape=(jax.ShapeDtypeStruct(oshape, jnp.float32),
                   jax.ShapeDtypeStruct(oshape, jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(x_in, *params_window, *params_grid, *extra, lstm_w, lstm_b,
      h_in, c_in)
    if dense:
        return h_t.reshape(B, H, W, C), c_t.reshape(B, H, W, C)
    return h_t, c_t


def stage_fusion_mode(H: int, W: int, C: int,
                      part: Tuple[int, int], *,
                      scan: bool = False) -> str | None:
    """Execution mode for the whole-stage/stage-scan kernels at this
    geometry: 'part' (partitioned reshapes), 'dense' (masked-dense small
    maps), or None (fall back to per-step kernels / XLA). Combines the
    VMEM envelope (same pair criterion as ``fused_attention_pair`` plus
    the LSTM weights/gates, ~+5 MB at C=512) with the Mosaic shape-cast
    envelope (``partition_geometry_ok``).

    ``scan``: the whole-window serving path (ops/fused_scan) can also
    return 'split' for gen4-stage-1-class images (512k < elements <=
    1M): the attention pair runs as ONE batched kernel launch over all
    T*B frames (it has no time recurrence) and only the ConvLSTM scans
    with its carry in VMEM (``fused_lstm_scan``). A single monolithic
    stage-scan kernel at that size reproducibly OOM-kills the Mosaic
    compile, so the one-kernel mode keeps the 512k envelope."""
    per_image_elems = H * W * C
    weight_bytes = 2 * 2 * (C * 3 * C + C * C + 8 * C * C) + 2 * 2 * C * 4 * C
    act_bytes = 14 * per_image_elems
    if weight_bytes + act_bytes > 24 * 2 ** 20:
        return None
    if per_image_elems > 512 * 1024:
        if (scan and per_image_elems <= 1024 * 1024
                and partition_geometry_ok(H, W, C, part)):
            return "split"
        return None
    if partition_geometry_ok(H, W, C, part):
        return "part"
    if dense_attention_ok(H, W):
        return "dense"
    return None


def stage_fusion_supported(per_image_elems: int, C: int) -> bool:
    """Deprecated VMEM-only check kept for callers that pre-screen sizes;
    prefer ``stage_fusion_mode`` (adds the Mosaic geometry envelope)."""
    weight_bytes = 2 * 2 * (C * 3 * C + C * C + 8 * C * C) + 2 * 2 * C * 4 * C
    act_bytes = 14 * per_image_elems
    return (weight_bytes + act_bytes <= 24 * 2 ** 20
            and per_image_elems <= 512 * 1024)


def pair_fusion_mode(H: int, W: int, C: int,
                     part: Tuple[int, int]) -> str | None:
    """Execution mode for the attention-pair kernels ('part' | 'dense' |
    None). The VMEM bound (1M elements/image, gen4 stage 1 verified on
    v5e) is as before; geometries whose partition chunks Mosaic cannot
    lane-split use the masked-dense path when small enough."""
    if H * W * C > 1024 * 1024:
        return None
    if partition_geometry_ok(H, W, C, part):
        return "part"
    if dense_attention_ok(H, W):
        return "dense"
    return None


def fused_attention_pair(x: Array, params_window: Tuple[Array, ...],
                         params_grid: Tuple[Array, ...], *, heads: int,
                         dim_head: int, part: Tuple[int, int],
                         skip_first_norm: bool, eps: float,
                         dense: bool = False,
                         ds_ln_params: Tuple[Array, ...] = (),
                         ds_eps: float = 1e-5,
                         interpret: bool = False) -> Array:
    """Window attention followed by grid attention (one MaxViT block).

    Fused into a single kernel when both blocks' weights + working set
    fit the 32 MB scoped-vmem cap together (stage 4's paired C=512
    weight set is ~12.6 MB bf16 + ~8 MB activations — it pairs since the
    cap was raised from the 16 MB default); otherwise two single-block
    kernels. ``ds_ln_params``: optional downsample-LN (scale, bias) run
    in-kernel on the raw conv output (requires skip_first_norm)."""
    C = x.shape[-1]
    per_image = x.shape[1] * x.shape[2] * C
    weight_bytes = 2 * 2 * (C * 3 * C + C * C + 8 * C * C)
    act_bytes = 14 * x.shape[1] * x.shape[2] * C
    # gen4-sized images (983k elements) stay split: even one block's f32
    # intermediates push ~45 MB of scoped vmem; pairing would overflow
    # the 64 MB cap.
    if weight_bytes + act_bytes <= 24 * 2 ** 20 and per_image <= 512 * 1024:
        blocks = ((True, skip_first_norm,
                   _N_PARAMS_SFN if skip_first_norm else _N_PARAMS),
                  (False, False, _N_PARAMS))
        return fused_attention_blocks(
            x, params_window + params_grid, blocks=blocks, heads=heads,
            dim_head=dim_head, part=part, eps=eps, dense=dense,
            ds_ln_params=ds_ln_params, ds_eps=ds_eps, interpret=interpret)
    n_win = _N_PARAMS_SFN if skip_first_norm else _N_PARAMS
    y = fused_attention_blocks(
        x, params_window, blocks=((True, skip_first_norm, n_win),),
        heads=heads, dim_head=dim_head, part=part, eps=eps, dense=dense,
        ds_ln_params=ds_ln_params, ds_eps=ds_eps, interpret=interpret)
    return fused_attention_blocks(
        y, params_grid, blocks=((False, False, _N_PARAMS),),
        heads=heads, dim_head=dim_head, part=part, eps=eps, dense=dense,
        interpret=interpret)


def attention_block_params(p: dict, skip_first_norm: bool
                           ) -> Tuple[Array, ...]:
    """Flatten one PartitionAttention param subtree (flax layout, master
    f32) into the kernel's argument tuple, pre-cast exactly as the XLA
    path's modules would (weights/LN affine -> bf16). The LayerScale
    gammas are folded into the proj/fc2 weights and biases in f32 before
    the bf16 cast — mathematically the XLA path's ``out*gamma`` with the
    bf16 rounding moved after the scale (within bf16 noise)."""
    # 1-D vectors are reshaped to (1, dim): Mosaic vector layouts are 2-D.
    bf = lambda a: jnp.asarray(a, jnp.bfloat16).reshape(1, -1)
    bfw = lambda a: jnp.asarray(a, jnp.bfloat16)
    g1 = jnp.asarray(p["ls1"]["gamma"], jnp.float32)
    g2 = jnp.asarray(p["ls2"]["gamma"], jnp.float32)
    attn = p["self_attn"]
    proj_w = jnp.asarray(attn["proj"]["kernel"], jnp.float32) * g1
    proj_b = jnp.asarray(attn["proj"]["bias"], jnp.float32) * g1
    fc2_w = jnp.asarray(p["mlp"]["fc2"]["kernel"], jnp.float32) * g2
    fc2_b = jnp.asarray(p["mlp"]["fc2"]["bias"], jnp.float32) * g2
    out = []
    if not skip_first_norm:
        out += [bf(p["norm1"]["scale"]), bf(p["norm1"]["bias"])]
    out += [bfw(attn["qkv"]["kernel"]), bf(attn["qkv"]["bias"]),
            bfw(proj_w), bf(proj_b),
            bf(p["norm2"]["scale"]), bf(p["norm2"]["bias"]),
            bfw(p["mlp"]["fc1"]["kernel"]), bf(p["mlp"]["fc1"]["bias"]),
            bfw(fc2_w), bf(fc2_b)]
    return tuple(out)
