"""Host→device prefetch pipeline.

The reference overlaps batch preparation with compute using one boost thread
and a join-before-copy handshake (depth-1 lookahead,
ref:src/caffe/layers/base_data_layer.cpp:52-95,
ref:src/caffe/internal_thread.cpp:14-37). TPU-native equivalent: a background
thread runs the (stateful, host-side) batch source and pushes batches through
a bounded queue; the consumer side transfers to device asynchronously
(jax.device_put returns immediately; the copy overlaps the running step) with
configurable depth — double buffering by default.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator

import jax


class DevicePrefetcher:
    """Wrap a host batch iterator; yields device-resident batches while the
    next host batch is being built and the next transfer is in flight."""

    _SENTINEL = object()

    def __init__(self, source: Iterator[dict], *, depth: int = 2,
                 sharding=None, max_batches: int | None = None,
                 transform: Callable[[dict], dict] | None = None):
        """source: iterator of dict[str, np.ndarray]. sharding: optional
        jax.sharding.Sharding (or pytree of) for device placement — pass the
        batch sharding from parallel.train.shard_batch's spec for multi-chip.
        """
        self._source = source
        self._sharding = sharding
        self._transform = transform
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._max_batches = max_batches
        self._stop = threading.Event()
        self._exc: BaseException | None = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            count = 0
            for batch in self._source:
                if self._stop.is_set():
                    return
                if self._transform is not None:
                    batch = self._transform(batch)
                # async H2D: device_put returns immediately; the transfer
                # overlaps the consumer's running computation
                if self._sharding is not None:
                    batch = jax.device_put(batch, self._sharding)
                else:
                    batch = jax.device_put(batch)
                # bounded put so close() terminates the thread even when
                # the consumer never drains (a worker parked forever in
                # q.put holds device buffers + open DB readers)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                else:
                    return
                count += 1
                if self._max_batches is not None and count >= self._max_batches:
                    break
            self._q.put(self._SENTINEL)
        except BaseException as e:  # surfaced on next __next__
            self._exc = e
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self) -> Any:
        if self._stop.is_set():
            # closed: the worker may never enqueue again — blocking on the
            # empty queue would hang the caller forever
            raise StopIteration
        item = self._q.get()
        if item is self._SENTINEL:
            self._stop.set()  # exhausted: later __next__ raises immediately
            if self._exc is not None:
                exc, self._exc = self._exc, None
                raise exc
            raise StopIteration
        return item

    def close(self):
        """Stop the worker and release its queued device batches. Safe to
        call any number of times; after close(), iteration raises
        StopIteration instead of blocking."""
        self._stop.set()
        # release queued device buffers (the worker's bounded put observes
        # _stop within its timeout and terminates on its own)
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
        # a worker already past its stop-check may have completed one
        # last put after the drain above — release that batch too now
        # that the thread is gone
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
