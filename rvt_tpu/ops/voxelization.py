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
  * ``stacked_histogram_pallas``: Pallas TPU kernel. Scatter-add is
    re-expressed as sort-by-output-row + per-row-tile one-hot matmuls so it
    lowers on Mosaic (which cannot lower per-event scalar VMEM stores) and
    runs the accumulation on the MXU with the histogram tile VMEM-resident,
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
#
# Mosaic cannot lower per-event scalar stores to VMEM, so scatter-add is
# re-expressed as dense compute the hardware is good at:
#
#   1. XLA: each event gets an output row id r = (pol*bins + t_bin)*H + y
#      and is sorted by r (32-bit key sort, cheap at these sizes).
#   2. Pallas grid (batch, row-tile): each program owns a 128-row slice of
#      the histogram in VMEM. Its event range [start, end) (from the sorted
#      order, boundaries scalar-prefetched) is streamed in via DMA; each
#      chunk builds one-hot row/column masks on the VPU and accumulates
#      hist_tile += R @ C^T on the MXU (bf16 one-hots, f32 accumulation —
#      exact for counts < 2^24).
#
# Events touch one chunk each, so the MXU work is
# 2*128*WP ~ 100 kFLOP/event — ~20 GFLOP for 8x32k events, far below the
# 4 ms the XLA scatter path needs.


def _hist_tile_kernel(off_ref, r_ref, x_ref, out_ref, acc, r_s, x_s, sem_r,
                      sem_x, *, events_chunk: int, rows_per_tile: int,
                      cols_per_tile: int, n_coltiles: int, n_padded: int,
                      count_cutoff: int):
    b = pl.program_id(0)
    rt = pl.program_id(1)
    ct = pl.program_id(2)
    tt = rt * n_coltiles + ct
    start = off_ref[b, tt]
    end = off_ref[b, tt + 1]
    acc[...] = jnp.zeros_like(acc)

    E = events_chunk
    ER = E // 128
    row0 = start // 128  # sublane row of `start` in the [B, N/128, 128] view
    nch = (end - row0 * 128 + E - 1) // E
    nch = jnp.where(end > start, nch, 0)  # empty tile: skip the matmul

    def body(k, _):
        nominal = row0 + k * ER
        rr0 = jnp.minimum(nominal, n_padded // 128 - ER)
        cp_r = pltpu.make_async_copy(r_ref.at[b, pl.ds(rr0, ER), :], r_s, sem_r)
        cp_x = pltpu.make_async_copy(x_ref.at[b, pl.ds(rr0, ER), :], x_s, sem_x)
        cp_r.start()
        cp_x.start()
        cp_r.wait()
        cp_x.wait()
        # Event positions covered by this (possibly clamp-shifted) load;
        # mask to exactly this chunk's nominal range so clamp overlap never
        # double-counts. Built directly in flat (1, E) layout — Mosaic
        # cannot shape-cast i1 vectors.
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, E), 1) + rr0 * 128
        lo = jnp.maximum(start, nominal * 128)
        hi = jnp.minimum(end, (nominal + ER) * 128)
        ok = (pos >= lo) & (pos < hi)
        rflat = r_s[...].reshape(1, E) - rt * rows_per_tile
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_per_tile, 1), 0)
        R = jnp.where((rows == rflat) & ok, 1.0, 0.0).astype(jnp.bfloat16)
        xflat = x_s[...].reshape(1, E) - ct * cols_per_tile
        cols = jax.lax.broadcasted_iota(jnp.int32, (cols_per_tile, 1), 0)
        CT = jnp.where(cols == xflat, 1.0, 0.0).astype(jnp.bfloat16)
        # precision=DEFAULT overrides the global f32 matmul-precision pin
        # (rvt_tpu/__init__.py) — Mosaic rejects bf16 operands under a
        # fp32 contract-precision request; 0/1 one-hots are exact in bf16.
        acc[...] += jax.lax.dot_general(
            R, CT, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        return 0

    jax.lax.fori_loop(0, nch, body, 0)
    # saturate + narrow in-kernel: the uint8 tile store is 4x less HBM
    # write traffic than the old f32 output (and drops the XLA min/cast
    # epilogue pass over the padded histogram). Mosaic cannot lower
    # float->unsigned directly (interpret mode accepts it) — go through
    # int32 (exact: counts are small non-negative integers).
    out_ref[0] = jnp.minimum(acc[...], float(count_cutoff)
                             ).astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("bins", "height", "width",
                                             "count_cutoff", "chunk",
                                             "interpret"))
def stacked_histogram_pallas_batched(x: Array, y: Array, pol: Array, t: Array,
                                     num_events: Array, bins: int, height: int,
                                     width: int, count_cutoff: int = 255,
                                     chunk: int = 1024,
                                     interpret: bool = False) -> Array:
    """Batched Pallas TPU voxelizer (same semantics as vmapped
    ``stacked_histogram`` for in-range coordinates; out-of-range events are
    dropped rather than row-aliased). Inputs are [B, N] int32, t sorted;
    ``num_events`` [B] counts the valid leading events. Lowers on real TPU
    (sort + one-hot-matmul formulation, see module notes) — measured ~2x
    faster than the XLA scatter path for 8x32k gen1 events on a v5e
    (1.8 ms vs 3.8 ms, docs/PERF.md)."""
    B, N = x.shape
    E = max(128, min(chunk, 4096) // 128 * 128)  # events per inner step
    npad = max(E, (N + 127) // 128 * 128)
    if npad != N:
        x, y, pol, t = (jnp.pad(a, ((0, 0), (0, npad - N)))
                        for a in (x, y, pol, t))

    rows_total = 2 * bins * height
    TR = 128   # histogram rows per grid tile
    CW = 128   # histogram columns per grid tile (one lane tile)
    n_rt = (rows_total + TR - 1) // TR
    wp = max(CW, (width + CW - 1) // CW * CW)
    n_ct = wp // CW
    n_tiles = n_rt * n_ct

    valid = jnp.arange(npad)[None, :] < num_events[:, None]
    t_idx = jax.vmap(lambda tt, nn: _time_bin_indices(tt, nn, bins))(
        t, num_events)
    r = (pol * bins + t_idx) * height + y
    drop = (~valid | (x < 0) | (x >= width) | (y < 0) | (y >= height)
            | (pol < 0) | (pol > 1))
    # sort key = (row-tile, col-tile) pair: each program owns a [128, 128]
    # tile, so the one-hot matmul is 128xEx128 regardless of image width.
    # (The previous full-width tile paid width/128 more MXU work per
    # chunk — 10x waste at gen4's padded width 1280.)
    tile = jnp.where(drop, n_tiles,
                     (r // TR) * n_ct + x // CW).astype(jnp.int32)
    r = jnp.where(drop, n_rt * TR, r).astype(jnp.int32)
    tile_sorted, r_sorted, x_sorted = jax.lax.sort(
        (tile, r, x.astype(jnp.int32)), num_keys=1)

    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    # tile offsets by binary search (O(n_tiles log N); the dense
    # [B, n_tiles+1, N] comparison this replaces was ~240M elements at
    # gen4 scale)
    off = jax.vmap(lambda ts: jnp.searchsorted(ts, bounds, side="left")
                   )(tile_sorted).astype(jnp.int32)  # [B, n_tiles+1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_rt, n_ct),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TR, CW),
                               lambda b, rt, ct, off: (b, rt, ct)),
        scratch_shapes=[
            pltpu.VMEM((TR, CW), jnp.float32),
            pltpu.VMEM((E // 128, 128), jnp.int32),
            pltpu.VMEM((E // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_hist_tile_kernel, events_chunk=E,
                               rows_per_tile=TR, cols_per_tile=CW,
                               n_coltiles=n_ct, n_padded=npad,
                               count_cutoff=count_cutoff)
    hist = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_rt * TR, wp), jnp.uint8),
        interpret=interpret,
    )(off, r_sorted.reshape(B, npad // 128, 128),
      x_sorted.reshape(B, npad // 128, 128))

    hist = hist[:, :rows_total, :width]
    return hist.reshape(B, 2 * bins, height, width)


def stacked_histogram_pallas(x: Array, y: Array, pol: Array, t: Array,
                             num_events: Array, bins: int, height: int,
                             width: int, count_cutoff: int = 255,
                             chunk: int = 1024,
                             interpret: bool = False) -> Array:
    """Single-stream wrapper over the batched Pallas voxelizer."""
    out = stacked_histogram_pallas_batched(
        x[None], y[None], pol[None], t[None],
        jnp.reshape(num_events, (1,)), bins, height, width,
        count_cutoff, chunk, interpret)
    return out[0]
