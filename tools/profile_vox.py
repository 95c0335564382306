"""Microbenchmark the on-device voxelizer pieces on TPU.

Times, for gen1 (240x304) and gen4 (720x1280) geometries at several
event counts and chunk sizes:
  * the XLA scatter path (`stacked_histogram`, vmapped),
  * the full Pallas path (`stacked_histogram_pallas_batched`),
  * the Pallas path's XLA prologue alone (time bins + sort + offsets),
isolating whether the sort or the tile kernel dominates at 1 Mpx
(round-2 finding: gen4 raw pipeline was "dominated by the 1 Mpx
voxelization", docs/PERF.md).

    python -m tools.profile_vox [--dataset gen1|gen4|both] [--iters 20]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GEOMS = {"gen1": (240, 304), "gen4": (720, 1280)}


def timeit(fn, *args, iters=20):
    import jax.numpy as jnp

    out = fn(*args)
    jnp.sum(jnp.asarray(out, jnp.float32)).item()  # force completion
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jnp.sum(jnp.asarray(out, jnp.float32)).item()
    return (time.perf_counter() - t0) / iters * 1000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="both",
                    choices=["gen1", "gen4", "both"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rvt_tpu.ops.voxelization import (_time_bin_indices,
                                          stacked_histogram,
                                          stacked_histogram_pallas_batched)

    print("devices:", jax.devices())
    B, bins = args.batch, 10
    names = ["gen1", "gen4"] if args.dataset == "both" else [args.dataset]
    for name in names:
        H, W = GEOMS[name]
        n_events = [32768] if name == "gen1" else [65536, 262144]
        for N in n_events:
            rng = np.random.RandomState(0)
            x = jnp.asarray(rng.randint(0, W, (B, N)), jnp.int32)
            y = jnp.asarray(rng.randint(0, H, (B, N)), jnp.int32)
            p = jnp.asarray(rng.randint(0, 2, (B, N)), jnp.int32)
            t = jnp.asarray(np.sort(rng.randint(0, 50_000, (B, N)), axis=1),
                            jnp.int32)
            c = jnp.full((B,), N - 3, jnp.int32)

            xla_fn = jax.jit(jax.vmap(functools.partial(
                stacked_histogram, bins=bins, height=H, width=W)))
            t_xla = timeit(xla_fn, x, y, p, t, c, iters=args.iters)
            print(f"{name} B{B} N{N}: XLA scatter {t_xla:.2f} ms")

            @jax.jit
            def prologue(x, y, p, t, c, H=H, W=W):
                valid = jnp.arange(N)[None, :] < c[:, None]
                t_idx = jax.vmap(
                    lambda tt, nn: _time_bin_indices(tt, nn, bins))(t, c)
                r = (p * bins + t_idx) * H + y
                TR = 128
                ntiles = (2 * bins * H + TR - 1) // TR
                drop = (~valid | (x < 0) | (x >= W) | (y < 0) | (y >= H))
                r = jnp.where(drop, ntiles * TR, r).astype(jnp.int32)
                r_s, x_s = jax.lax.sort((r, x), num_keys=1)
                bounds = jnp.arange(ntiles + 1, dtype=jnp.int32) * TR
                off = jax.vmap(lambda rs: jnp.searchsorted(
                    rs, bounds, side="left"))(r_s).astype(jnp.int32)
                return r_s, x_s, off

            t_pro = timeit(prologue, x, y, p, t, c, iters=args.iters)
            print(f"{name} B{B} N{N}: prologue (bins+sort+offsets) "
                  f"{t_pro:.2f} ms")

            for chunk in (1024, 2048, 4096):
                fn = functools.partial(
                    stacked_histogram_pallas_batched, bins=bins, height=H,
                    width=W, chunk=chunk)
                t_pal = timeit(fn, x, y, p, t, c, iters=args.iters)
                print(f"{name} B{B} N{N}: Pallas total (chunk {chunk}) "
                      f"{t_pal:.2f} ms  ({t_xla / t_pal:.2f}x vs XLA)")


if __name__ == "__main__":
    main()
