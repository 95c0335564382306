"""Measure the HOST input pipeline: blosc-HDF5 -> Batch -> (s2d) -> device.

Round-3 verdict item #3: the device serves ~5.7k frames/s but the host
pipeline feeding it had never been measured. This tool builds a synthetic
preprocessed dataset at real gen1 geometry (240x304x20 uint8 frames,
blosc-zstd chunks of 1 frame — the published format) and times each stage:

  raw h5 window reads -> EvalStreamScheduler batches -> ParallelBatchLoader
  (thread/process x worker counts) -> + host s2d stem transform ->
  + jax.device_put

    python -m tools.bench_input [--recordings 4] [--frames 256]
        [--batch 8] [--seq_len 21] [--workers 0 1 2 4] [--density 0.05]

Prints a frames/s table and one JSON line for the strongest loader config.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPR = "stacked_histogram_dt=50_nbins=10"
BBOX_DTYPE = np.dtype({
    "names": ["t", "x", "y", "w", "h", "class_id", "track_id",
              "class_confidence"],
    "formats": ["<i8", "<f4", "<f4", "<f4", "<f4", "<u4", "<u4", "<f4"],
    "offsets": [0, 8, 12, 16, 20, 24, 28, 32], "itemsize": 40})


def make_dataset(root: Path, n_rec: int, frames: int, hw=(240, 304),
                 bins=10, density=0.05, seed=0,
                 codec: str = "blosc-zstd") -> None:
    """Synthetic preprocessed recordings in the published on-disk format
    (sequence.py docstring): sparse uint8 histograms at event-data-like
    density so decode cost is realistic. ``codec``: blosc-zstd (the
    published format), blosc-lz4, or none (raw chunks) — the
    cli/preprocess.py --compression choices."""
    import h5py

    from rvt_tpu.data import blosc_h5

    if codec == "none":
        comp_kwargs = {}
    else:
        assert blosc_h5.register_plugin(), \
            "build native/ first (make -C native)"
        comp_kwargs = blosc_h5.blosc_opts(complevel=1,
                                          complib="blosc:" + codec[6:])
    H, W = hw
    C = 2 * bins
    for r in range(n_rec):
        rng = np.random.RandomState(seed + r)
        rec = root / f"rec_{r:02d}"
        repr_dir = rec / "event_representations_v2" / REPR
        repr_dir.mkdir(parents=True, exist_ok=True)
        (rec / "labels_v2").mkdir(parents=True, exist_ok=True)

        with h5py.File(str(repr_dir / "event_representations.h5"), "w") as f:
            ds = f.create_dataset("data", shape=(frames, C, H, W),
                                  dtype=np.uint8, chunks=(1, C, H, W),
                                  **comp_kwargs)
            for t in range(frames):
                fr = np.zeros((C, H, W), np.uint8)
                n = int(density * fr.size)
                idx = rng.randint(0, fr.size, n)
                np.add.at(fr.reshape(-1), idx, 1)
                ds[t] = fr
        ts = (np.arange(frames, dtype=np.int64) + 1) * 50_000
        np.save(str(repr_dir / "timestamps_us.npy"), ts)
        # labels every 5th frame from frame 12 (past the 0.5 s protocol skip)
        objframes = np.arange(12, frames, 5, dtype=np.int64)
        np.save(str(repr_dir / "objframe_idx_2_repr_idx.npy"), objframes)
        rows = []
        for fi in objframes:
            for _ in range(rng.randint(1, 4)):
                w, h = rng.uniform(20, 80), rng.uniform(15, 60)
                rows.append((ts[fi], rng.uniform(0, W - w),
                             rng.uniform(0, H - h), w, h,
                             rng.randint(0, 2), 0, 1.0))
        labels = np.array(rows, dtype=BBOX_DTYPE)
        obj2label = np.searchsorted(labels["t"], ts[objframes])
        np.savez(str(rec / "labels_v2" / "labels.npz"), labels=labels,
                 objframe_idx_2_label_idx=obj2label)
        np.save(str(rec / "labels_v2" / "timestamps_us.npy"), ts[objframes])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/rvt_bench_input")
    ap.add_argument("--recordings", type=int, default=4)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq_len", type=int, default=21)
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 1, 2, 4])
    ap.add_argument("--density", type=float, default=0.05)
    ap.add_argument("--codec", default="blosc-zstd",
                    choices=["blosc-zstd", "blosc-lz4", "none"],
                    help="on-disk codec of the synthetic dataset (the "
                         "cli/preprocess.py --compression choices)")
    ap.add_argument("--device", action="store_true",
                    help="add s2d transform + jax.device_put stages")
    args = ap.parse_args()

    from rvt_tpu.data.loader import ParallelBatchLoader
    from rvt_tpu.data.sequence import Recording, StreamView
    from rvt_tpu.data.streaming import EvalStreamScheduler

    root = Path(args.dir) / args.codec
    marker = root / f".built_{args.recordings}_{args.frames}_{args.density}"
    if not marker.exists():
        import shutil

        if root.exists():
            shutil.rmtree(root)
        root.mkdir(parents=True)
        t0 = time.perf_counter()
        make_dataset(root, args.recordings, args.frames,
                     density=args.density, codec=args.codec)
        marker.touch()
        print(f"built {args.codec} dataset in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    frame_bytes = 20 * 240 * 304
    h5_bytes = sum(f.stat().st_size for f in root.rglob("*.h5"))
    total_frames = args.recordings * args.frames
    print(f"dataset: {args.recordings} rec x {args.frames} frames, "
          f"{h5_bytes / 2**20:.0f} MiB on disk "
          f"({h5_bytes / total_frames / 2**10:.0f} KiB/frame compressed, "
          f"{frame_bytes / 2**10:.0f} KiB raw)", flush=True)

    def views(prefer_raw):
        recs = [Recording(p, REPR, (240, 304), prefer_raw_chunks=prefer_raw)
                for p in sorted(root.iterdir()) if p.is_dir()]
        return [StreamView(r, args.seq_len) for r in recs]

    # stage 1: bare window reads, one stream (h5+blosc decode only)
    v = views(False)[0]
    t0 = time.perf_counter()
    for i in range(len(v)):
        v[i]
    dt = time.perf_counter() - t0
    n_frames = len(v) * args.seq_len
    print(f"window reads (1 stream, plugin):   {n_frames / dt:8.0f} frames/s "
          f"({n_frames * frame_bytes / dt / 2**30:.2f} GiB/s uncompressed)",
          flush=True)

    results = {}

    def run(label, loader, n_frames_hint=None):
        t0 = time.perf_counter()
        frames = 0
        for b in loader:
            frames += b.batch_size * b.seq_len
        dt = time.perf_counter() - t0
        fps = frames / dt
        results[label] = fps
        print(f"{label:34s} {fps:8.0f} frames/s", flush=True)

    for mode in ("thread", "process"):
        for nw in args.workers:
            if nw == 0 and mode == "process":
                continue
            for raw_chunks in ((False, True) if mode == "thread" and nw
                               else (False,)):
                sched = EvalStreamScheduler(views(raw_chunks), args.batch)
                label = (f"{mode} x{nw}" + (" +raw-chunks" if raw_chunks
                                            else ""))
                if nw == 0:
                    label = "serial scheduler"
                run(label, ParallelBatchLoader(sched, nw, mode=mode,
                                               prefetch_batches=4))

    if args.device:
        import jax

        from rvt_tpu.ops.s2d import host_space_to_depth

        def xf(b):
            b.ev_repr = host_space_to_depth(b.ev_repr, (256, 320))
            return b

        best_nw = max(args.workers)
        sched = EvalStreamScheduler(views(True), args.batch)
        loader = ParallelBatchLoader(sched, best_nw, mode="thread",
                                     prefetch_batches=4, transform=xf)
        t0 = time.perf_counter()
        frames = 0
        for b in loader:
            arr = jax.device_put(b.ev_repr)
            frames += b.batch_size * b.seq_len
        arr.block_until_ready()
        dt = time.perf_counter() - t0
        results["+s2d+device_put"] = frames / dt
        print(f"{'thread x%d +s2d +device_put' % best_nw:34s} "
              f"{frames / dt:8.0f} frames/s", flush=True)

    best = max(results.items(), key=lambda kv: kv[1])
    print(json.dumps({"metric": "host_input_frames_per_s",
                      "value": round(best[1], 1), "config": best[0],
                      "codec": args.codec,
                      "kib_per_frame": round(h5_bytes / total_frames / 2**10,
                                             1),
                      "serial": round(results.get("serial scheduler", 0), 1)}))


if __name__ == "__main__":
    main()
