"""Verify + time the Pallas TPU kernels on the real chip (lowered, not
interpret mode). Run on hardware:  python -m tools.verify_tpu_kernels

Checks, against their XLA oracles:
  * stacked_histogram_pallas_batched — bit-exact equality on gen1-geometry
    uniform and worst-case clustered event sets, plus a wall-clock
    comparison vs the XLA scatter path,
  * fused backbone kernels (when present) via the precision test suite.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=20):
    import jax.numpy as jnp
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def main() -> int:
    import jax
    import jax.numpy as jnp

    from rvt_tpu.ops.voxelization import (stacked_histogram,
                                          stacked_histogram_pallas_batched)

    print("devices:", jax.devices())
    B, N, bins, H, W = 8, 32768, 10, 240, 304
    rng = np.random.RandomState(0)
    cases = {}
    x = rng.randint(0, W, (B, N)).astype(np.int32)
    y = rng.randint(0, H, (B, N)).astype(np.int32)
    cases["uniform"] = (x, y)
    cases["clustered"] = (np.full((B, N), 5, np.int32),
                          np.full((B, N), 17, np.int32))
    p = rng.randint(0, 2, (B, N)).astype(np.int32)
    t = np.sort(rng.randint(0, 50000, (B, N)), axis=1).astype(np.int32)
    counts = np.full((B,), N - 123, np.int32)
    pj, tj, cj = map(jnp.asarray, (p, t, counts))

    ref_fn = jax.jit(jax.vmap(lambda a, b, c, d, n: stacked_histogram(
        a, b, c, d, n, bins, H, W)))
    pallas_fn = jax.jit(lambda a, b, c, d, n: stacked_histogram_pallas_batched(
        a, b, c, d, n, bins=bins, height=H, width=W))

    failures = 0
    for name, (cx, cy) in cases.items():
        xj, yj = jnp.asarray(cx), jnp.asarray(cy)
        ref = np.asarray(ref_fn(xj, yj, pj, tj, cj))
        got = np.asarray(pallas_fn(xj, yj, pj, tj, cj))
        ok = np.array_equal(got, ref)
        failures += not ok
        print(f"voxelizer/{name}: {'OK' if ok else 'MISMATCH'} "
              f"(sum={got.sum()})")

    xj, yj = map(jnp.asarray, cases["uniform"])
    t_xla = timeit(ref_fn, xj, yj, pj, tj, cj)
    t_pal = timeit(pallas_fn, xj, yj, pj, tj, cj)
    print(f"voxelizer 8x32k gen1: XLA scatter {t_xla:.2f} ms, "
          f"Pallas {t_pal:.2f} ms ({t_xla / t_pal:.2f}x)")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
