"""Event-stream voxelization: raw events -> dense tensors, on device.

Replaces the reference's torch ``tensor.put_(accumulate=True)`` scatter-add
(``data/utils/representations.py:37-121`` StackedHistogram,
``124-218`` MixedDensityEventStack) and the numba time-repair loop
(``scripts/genx/preprocess_dataset.py:163-172``) with TPU-resident
implementations:

  * events arrive as fixed-size padded arrays (x, y, p, t, valid-count) —
    static shapes for XLA,
  * ``stacked_histogram``: pure-jax scatter-add (XLA scatter) — works on any
    backend and is the reference semantics oracle,
  * ``stacked_histogram_pallas``: Pallas kernel keeping the histogram in
    VMEM while streaming event chunks. NOTE: current Mosaic cannot lower
    per-event scalar stores to VMEM, so this kernel runs in interpret mode
    only (kept as the semantics reference and for a future vector rewrite);
    the XLA scatter path measures 4 ms for 8x32k events on a v5e and is the
    production device voxelizer (see rvt_tpu/inference.py),
  * monotonic-time repair is a running max (``lax.cummax`` equivalent via
    ``jax.lax.associative_scan``), exactly what the numba loop computes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def repair_time_monotonicity(t: Array) -> Array:
    """Running max over event timestamps (== the numba loop at
    preprocess_dataset.py:163-172)."""
    return jax.lax.associative_scan(jnp.maximum, t)


def _time_bin_indices(t: Array, num_events: Array, bins: int) -> Array:
    """Normalized time -> bin index in [0, bins), matching
    representations.py:102-109 (floor of t_norm * bins, clamped)."""
    n = jnp.maximum(num_events, 1)
    t0 = t[0]
    t1 = t[jnp.maximum(n - 1, 0)]
    denom = jnp.maximum(t1 - t0, 1).astype(jnp.float32)
    t_norm = (t - t0).astype(jnp.float32) / denom
    t_idx = jnp.floor(t_norm * bins)
    return jnp.clip(t_idx.astype(jnp.int32), 0, bins - 1)


@functools.partial(jax.jit, static_argnames=("bins", "height", "width",
                                             "count_cutoff"))
def stacked_histogram(x: Array, y: Array, pol: Array, t: Array,
                      num_events: Array, bins: int, height: int, width: int,
                      count_cutoff: int = 255) -> Array:
    """StackedHistogram (representations.py:37-121), static shapes.

    x, y, pol, t: [N] int32 padded event arrays (sorted by t);
    num_events: scalar int32 — number of valid leading events.
    Returns [2*bins, H, W] uint8.
    """
    N = x.shape[0]
    valid = jnp.arange(N) < num_events
    t_idx = _time_bin_indices(t, num_events, bins)
    flat = (x + width * y + height * width * t_idx
            + bins * height * width * pol)
    flat = jnp.where(valid, flat, 2 * bins * height * width)  # OOB -> dropped
    hist = jnp.zeros((2 * bins * height * width,), jnp.int32)
    hist = hist.at[flat].add(1, mode="drop")
    hist = jnp.minimum(hist, count_cutoff).astype(jnp.uint8)
    return hist.reshape(2 * bins, height, width)


@functools.partial(jax.jit, static_argnames=("bins", "height", "width",
                                             "count_cutoff"))
def mixed_density_stack(x: Array, y: Array, pol: Array, t: Array,
                        num_events: Array, bins: int, height: int, width: int,
                        count_cutoff: int = 127) -> Array:
    """MixedDensityEventStack (representations.py:130-218), static shapes.

    Log2-spaced time bins, polarity +/-1 scatter, reverse cumulative sum
    across bins, clip to +/-count_cutoff. Returns [bins, H, W] int8.
    """
    N = x.shape[0]
    valid = jnp.arange(N) < num_events
    n = jnp.maximum(num_events, 1)
    t0 = t[0]
    t1 = t[jnp.maximum(n - 1, 0)]
    denom = jnp.maximum(t1 - t0, 1).astype(jnp.float32)
    t_norm = jnp.clip((t - t0).astype(jnp.float32) / denom, 1e-6, 1 - 1e-6)
    # bin = N - log(t_norm) / log(1/2)  (representations.py:205)
    bin_float = jnp.maximum(bins - jnp.log(t_norm) / jnp.log(0.5), 0.0)
    t_idx = jnp.minimum(jnp.floor(bin_float).astype(jnp.int32), bins - 1)

    flat = x + width * y + height * width * t_idx
    flat = jnp.where(valid, flat, bins * height * width)
    values = jnp.where(valid, pol * 2 - 1, 0)
    rep = jnp.zeros((bins * height * width,), jnp.int32)
    rep = rep.at[flat].add(values, mode="drop")
    rep = rep.reshape(bins, height, width)
    # cumsum_channel (representations.py:124-127): channel i <- sum(0..i)
    rep = jnp.cumsum(rep, axis=0)
    rep = jnp.clip(rep, -count_cutoff, count_cutoff)
    return rep.astype(jnp.int8)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _histogram_kernel(nev_ref, flat_ref, out_ref):
    """Accumulate a chunk of flat indices into the VMEM-resident histogram.

    Grid is (batch, chunks) — chunks iterate fastest, so one lane's output
    block stays pinned in VMEM across all its event chunks and is written
    back to HBM once.
    """
    b = pl.program_id(0)
    chunk_idx = pl.program_id(1)
    rows, cols = flat_ref.shape[2], flat_ref.shape[3]
    chunk = rows * cols

    @pl.when(chunk_idx == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    n_valid = nev_ref[b] - chunk_idx * chunk
    size = out_ref.shape[1] * out_ref.shape[2]

    def body(i, _):
        idx = flat_ref[0, 0, i // cols, i % cols]
        idx = jnp.where(i < n_valid, idx, size)
        r = idx // out_ref.shape[2]
        c = idx % out_ref.shape[2]

        @pl.when(idx < size)
        def _():
            out_ref[0, r, c] += 1

        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(jax.jit, static_argnames=("bins", "height", "width",
                                             "count_cutoff", "chunk",
                                             "interpret"))
def stacked_histogram_pallas_batched(x: Array, y: Array, pol: Array, t: Array,
                                     num_events: Array, bins: int, height: int,
                                     width: int, count_cutoff: int = 255,
                                     chunk: int = 8192,
                                     interpret: bool = False) -> Array:
    """Batched Pallas TPU scatter-add voxelizer (same semantics as
    vmapped ``stacked_histogram``). Inputs are [B, N]; the batch lives in
    the grid (do NOT vmap this — the SMEM count input does not batch).
    Each lane's histogram stays in VMEM across its event chunks."""
    B, N = x.shape
    chunk = min(chunk, N)
    chunk = max((chunk // 1024) * 1024, 1024)  # 8 x 128-aligned tiles
    if N % chunk:
        pad_n = chunk - N % chunk
        x, y, pol, t = (jnp.pad(a, ((0, 0), (0, pad_n))) for a in (x, y, pol, t))
        N += pad_n
    hw = height * width
    hw_pad = ((hw + 127) // 128) * 128
    assert 2 * bins * hw_pad * 4 <= 12 * 2 ** 20, \
        "histogram exceeds VMEM; use stacked_histogram (XLA scatter)"

    valid = jnp.arange(N)[None, :] < num_events[:, None]
    t_idx = jax.vmap(lambda tt, nn: _time_bin_indices(tt, nn, bins))(
        t, num_events)
    channel = pol * bins + t_idx
    flat = channel * hw_pad + (x + width * y)
    flat = jnp.where(valid, flat, 2 * bins * hw_pad)
    nchunks = N // chunk
    # TPU block constraint: a block's trailing two dims must tile (8, 128)
    # or equal the array dims -> stage events as [B, nchunks, 8, chunk/8]
    flat = flat.reshape(B, nchunks, 8, chunk // 8)

    grid = (B, nchunks)
    hist = pl.pallas_call(
        _histogram_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8, chunk // 8), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * bins, hw_pad), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * bins, hw_pad), jnp.int32),
        interpret=interpret,
    )(num_events.astype(jnp.int32), flat)
    hist = jnp.minimum(hist[:, :, :hw], count_cutoff).astype(jnp.uint8)
    return hist.reshape(B, 2 * bins, height, width)


def stacked_histogram_pallas(x: Array, y: Array, pol: Array, t: Array,
                             num_events: Array, bins: int, height: int,
                             width: int, count_cutoff: int = 255,
                             chunk: int = 8192,
                             interpret: bool = False) -> Array:
    """Single-stream wrapper over the batched Pallas voxelizer."""
    out = stacked_histogram_pallas_batched(
        x[None], y[None], pol[None], t[None],
        jnp.reshape(num_events, (1,)), bins, height, width,
        count_cutoff, chunk, interpret)
    return out[0]
