"""Background-thread batch prefetch for the training data path.

The reference overlaps host data loading with device compute via torch
DataLoader worker processes (``num_workers: 8``, reference:
configs/data/default.yaml:3, src/runner.py:108-124). The TPU rebuild's
host work per step is small (np.load + stack of pre-extracted features),
so a single background *thread* double-buffering the batch iterator is the
right-sized equivalent: while the device runs step N, the thread assembles
step N+1's numpy batch. ``data.num_workers=0`` disables it (torch
semantics: 0 = synchronous loading in the main thread); any value >= 1
enables the bounded-depth pipeline.

Order-preserving by construction (one worker, FIFO queue), so pipelined
and serial training are bit-identical — pinned by
tests/test_training.py::test_prefetch_pipelined_equals_serial.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_DONE = object()


class _WorkerError:
    def __init__(self, exc: BaseException) -> None:
        self.exc = exc


def prefetch(iterable: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Yield ``iterable``'s items while a daemon thread keeps up to
    ``depth`` of them assembled ahead of the consumer.

    Items are yielded in order; worker exceptions re-raise at the
    consumer's next pull. Abandoning the iterator (break / preemption stop,
    runner.py's stop_requested path) unblocks and stops the worker via the
    generator's ``close()``/finally.
    """
    depth = int(depth)
    if depth < 1:
        raise ValueError(f"prefetch depth must be >= 1, got {depth}")
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that gives up when the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker() -> None:
        try:
            for item in iterable:
                if not _put(item):
                    return
        except BaseException as exc:  # re-raised on the consumer side
            _put(_WorkerError(exc))
            return
        _put(_DONE)

    thread = threading.Thread(
        target=worker, name="batch-prefetch", daemon=True
    )
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, _WorkerError):
                raise item.exc
            yield item
    finally:
        stop.set()
        # drain one slot so a worker blocked in put() observes the stop
        try:
            q.get_nowait()
        except queue.Empty:
            pass
        thread.join(timeout=5.0)
