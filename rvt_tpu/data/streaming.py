"""Stream scheduling: recordings -> batch lanes -> Batch windows.

Re-design of the reference's torchdata plumbing:
  * train: ``ConcatStreamingDataPipe`` (stream_concat_datapipe.py:25-103) —
    per worker, ``batch_size`` independent infinite streams, each a
    reshuffled concatenation of all recordings.
  * eval: ``ShardedStreamingDataPipe`` (stream_sharded_datapipe.py:10-94) —
    recordings dealt to workers/lanes with fully-padded fill windows so all
    lanes emit the same number of windows.

Here each *batch lane* owns a queue of stream views and recurrent state is
keyed by lane index (deterministic, mesh-shardable) instead of dataloader
worker id — cleaner than the reference's worker-keyed RNNStates registry
(modules/utils/detection.py:76-130).
"""
from __future__ import annotations

import random
from typing import Iterator, List, Optional, Sequence

import numpy as np

from rvt_tpu.data.sequence import StreamView
from rvt_tpu.data.types import Batch


def _stack(dicts: Sequence[dict], worker_id: int = 0) -> Batch:
    return Batch(
        ev_repr=np.stack([d["ev_repr"] for d in dicts]).transpose(0, 1, 3, 4, 2),
        labels=np.stack([d["labels"] for d in dicts]),
        label_mask=np.stack([d["label_mask"] for d in dicts]),
        frame_valid=np.stack([d["frame_valid"] for d in dicts]),
        is_first_sample=np.stack([d["is_first_sample"] for d in dicts]),
        is_padded=np.stack([d["is_padded"] for d in dicts]),
        worker_id=worker_id,
    )


class TrainStreamScheduler:
    """Infinite mixed stream batches for training.

    Each lane cycles through an independently shuffled permutation of all
    stream views; when a lane's current view is exhausted the next one
    starts with ``is_first_sample=True``. Matches the semantics of the
    reference's per-worker Zipper of shuffled Concater pipes
    (stream_concat_datapipe.py:62-103) without the worker indirection.
    """

    def __init__(self, streams: Sequence[StreamView], batch_size: int,
                 seed: int = 0, augment_fn=None):
        assert len(streams) > 0
        self.streams = list(streams)
        self.batch_size = batch_size
        self.augment_fn = augment_fn
        self._rngs = [random.Random(seed * 7919 + lane) for lane in range(batch_size)]
        self._orders: List[List[int]] = [[] for _ in range(batch_size)]
        self._cur: List[Optional[Iterator]] = [None] * batch_size
        self._augment_state = [None] * batch_size

    def _next_view_iter(self, lane: int) -> Iterator:
        if not self._orders[lane]:
            order = list(range(len(self.streams)))
            self._rngs[lane].shuffle(order)
            self._orders[lane] = order
        view = self.streams[self._orders[lane].pop()]
        if self.augment_fn is not None:
            # re-randomize augmentation once per stream
            # (RandAugmentIterDataPipe, sequence_for_streaming.py:205-208)
            self._augment_state[lane] = self.augment_fn.sample_state(
                self._rngs[lane], allow_zoom_in=False)
        return iter(range(len(view))), view

    def __iter__(self) -> Iterator[Batch]:
        iters = [None] * self.batch_size
        views = [None] * self.batch_size
        while True:
            samples = []
            for lane in range(self.batch_size):
                while True:
                    if iters[lane] is None:
                        iters[lane], views[lane] = self._next_view_iter(lane)
                    try:
                        idx = next(iters[lane])
                        break
                    except StopIteration:
                        iters[lane] = None
                sample = views[lane][idx]
                if self.augment_fn is not None:
                    sample = self.augment_fn.apply(sample, self._augment_state[lane])
                samples.append(sample)
            yield _stack(samples)


class EvalStreamScheduler:
    """Deterministic full-coverage evaluation batches.

    Deals recordings to lanes longest-first onto the currently shortest
    lane (balanced makespan), then zips lanes into batches, drawing
    fully-padded fill windows from exhausted lanes until every lane is
    drained — the same coverage guarantee as the reference's pyramid
    round-robin + ZipperLongest (stream_sharded_datapipe.py:31-67).

    ``shard_index``/``num_shards`` split recordings across data-parallel
    processes (reference: rank * num_workers + worker id, 73-80).
    """

    def __init__(self, streams: Sequence[StreamView], batch_size: int,
                 shard_index: int = 0, num_shards: int = 1):
        assert num_shards >= 1 and 0 <= shard_index < num_shards
        streams = sorted(streams, key=len, reverse=True)
        shard = streams[shard_index::num_shards]
        self.lanes: List[List[StreamView]] = [[] for _ in range(batch_size)]
        lane_loads = np.zeros(batch_size, np.int64)
        for view in shard:
            lane = int(lane_loads.argmin())
            self.lanes[lane].append(view)
            lane_loads[lane] += len(view)
        self.batch_size = batch_size
        self.num_batches = int(lane_loads.max()) if len(shard) else 0

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Batch]:
        fill_rec = None
        for lane_views in self.lanes:
            if lane_views:
                fill_rec = lane_views[0].rec
                break
        if fill_rec is None:
            return
        seq_len = None
        iters = []
        for lane_views in self.lanes:
            def lane_iter(views=lane_views):
                for v in views:
                    for i in range(len(v)):
                        yield v[i]
            iters.append(lane_iter())
            if lane_views:
                seq_len = lane_views[0].seq_len
        for _ in range(self.num_batches):
            samples = []
            for it in iters:
                try:
                    samples.append(next(it))
                except StopIteration:
                    samples.append(fill_rec.padded_window(seq_len))
            yield _stack(samples)
