"""Region timers + TPU profiling hooks.

Mirror of ``utils/timers.py:12-95`` (CudaTimer/Timer/TimerDummy with atexit
summary), TPU-native: device timing uses ``block_until_ready`` instead of
cuda synchronize, and ``profile_trace`` wraps ``jax.profiler`` for xprof
traces (the reference has no profiler integration at all).

As in the reference, the dummy timer is what hot paths import by default —
enable real timing by importing ``DeviceTimer``/``Timer`` instead.
"""
from __future__ import annotations

import atexit
import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax

_TIMING_SUMS: Dict[str, float] = defaultdict(float)
_TIMING_COUNTS: Dict[str, int] = defaultdict(int)


class Timer:
    """Wall-clock region timer accumulating into a global summary."""

    def __init__(self, timer_name: str = ""):
        self.name = timer_name

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        _TIMING_SUMS[self.name] += dt
        _TIMING_COUNTS[self.name] += 1


class DeviceTimer(Timer):
    """Times until outstanding device work completes. Pass the arrays whose
    computation the region produces to ``observe``; their readiness bounds
    the region (the TPU analogue of the reference's cuda-sync timer)."""

    def __init__(self, timer_name: str = "", observe=None):
        super().__init__(timer_name)
        self._observe = observe

    def __exit__(self, *exc):
        if self._observe is not None:
            jax.block_until_ready(self._observe)
        super().__exit__(*exc)


class TimerDummy:
    """No-op stand-in (active default in hot paths, as in the reference)."""

    def __init__(self, *args, **kwargs):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture an xprof trace of the enclosed region (view with
    tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timing_summary() -> Dict[str, Dict[str, float]]:
    return {k: {"total_s": _TIMING_SUMS[k], "count": _TIMING_COUNTS[k],
                "mean_s": _TIMING_SUMS[k] / max(_TIMING_COUNTS[k], 1)}
            for k in _TIMING_SUMS}


@atexit.register
def _print_summary() -> None:  # pragma: no cover
    if not _TIMING_SUMS:
        return
    print("== Timing statistics ==")
    for name, s in timing_summary().items():
        print(f"  {name or '<unnamed>'}: total {s['total_s']:.3f}s over "
              f"{s['count']} calls (mean {s['mean_s'] * 1e3:.2f} ms)")
