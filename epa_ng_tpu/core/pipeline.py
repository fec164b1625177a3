"""Asynchronous streaming pipeline: overlap host IO with device compute.

Replaces the reference's __PREFETCH machinery (async next-chunk reads,
src/seq/MSA_Stream.cpp:63-88, and async jplace chunk writes,
src/io/jplace_writer.hpp:58-69) and is the wired-in successor of its
typed-stage Pipeline (src/pipeline/Pipeline.hpp — present but unwired in the
reference's main path):

    reader thread -> [chunk queue] -> compute (device) -> [result queue]
    -> writer thread

Each stage records per-chunk timings (utils.Timer) so multi-host jobs can
rebalance with parallel.schedule.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Optional

from epa_ng_tpu.utils.timer import Timer

_END = object()


class StreamingPipeline:
    """Three-stage streaming pipeline with bounded prefetch queues."""

    def __init__(self, read_chunk: Callable[[], Optional[object]],
                 compute: Callable[[object, int], object],
                 write: Callable[[object], None],
                 prefetch: int = 2):
        """read_chunk() -> chunk or None at end; compute(chunk, index) ->
        result; write(result)."""
        self._read = read_chunk
        self._compute = compute
        self._write = write
        self._in_q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._out_q: queue.Queue = queue.Queue(maxsize=prefetch)
        self.read_timer = Timer()
        self.compute_timer = Timer()
        self.write_timer = Timer()
        self._error: Optional[BaseException] = None

    def _reader(self):
        try:
            while True:
                self.read_timer.start()
                chunk = self._read()
                self.read_timer.stop()
                if chunk is None:
                    break
                self._in_q.put(chunk)
        except BaseException as e:  # propagate to the main thread
            self._error = e
        finally:
            self._in_q.put(_END)

    def _writer(self):
        try:
            while True:
                item = self._out_q.get()
                if item is _END:
                    break
                self.write_timer.start()
                self._write(item)
                self.write_timer.stop()
        except BaseException as e:
            self._error = e
            # drain so the producer never blocks
            while self._out_q.get() is not _END:
                pass

    def run(self) -> int:
        """Run to completion; returns the number of chunks processed."""
        rt = threading.Thread(target=self._reader, daemon=True)
        wt = threading.Thread(target=self._writer, daemon=True)
        rt.start()
        wt.start()
        n = 0
        try:
            while True:
                chunk = self._in_q.get()
                if chunk is _END:
                    break
                self.compute_timer.start()
                result = self._compute(chunk, n)
                self.compute_timer.stop()
                self._out_q.put(result)
                n += 1
                if self._error:
                    break
        finally:
            self._out_q.put(_END)
            wt.join()
            rt.join(timeout=5)
        if self._error:
            raise self._error
        return n
