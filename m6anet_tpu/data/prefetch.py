"""Bounded background-thread prefetch for host-side iterators.

The ctypes parsing core releases the GIL while C code runs, so a producer
thread genuinely overlaps data.json parsing/packing with device compute and
CSV writing.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def threaded_iter(source: Iterable[T], depth: int = 4) -> Iterator[T]:
    """Iterate ``source`` on a daemon thread, buffering up to ``depth`` items.

    Exceptions from the producer are re-raised at the consumer.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    error = []

    def produce():
        try:
            for item in source:
                q.put(item)
        except BaseException as exc:  # re-raised on the consumer side
            error.append(exc)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if error:
                raise error[0]
            return
        yield item
