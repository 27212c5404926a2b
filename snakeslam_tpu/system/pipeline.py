"""Async pipeline: threaded front-end stages + asynchronous back-ends.

Mirrors the reference's deployment-mode concurrency (reference:
Snake/Preprocess/Input.cpp:237-325 camera + grayscale threads,
FeatureDetector.cpp:58-80 detection thread, bounded SynchronizedBuffer
hand-offs — Input.h:48 is 2-deep): a producer thread runs dataset IO +
feature detection + preprocessing, feeding a bounded queue; tracking
consumes on the caller's thread.  ``async=false`` (deterministic mode) is
the default everywhere else in this framework; this module is opt-in via
Settings.async_mode (README.md:53-65 semantics).

Asynchronous LBA (Settings.async_lba) reuses the reference's protocol:
pack under the map lock -> solve lock-free -> commit under the lock with a
generation check (LocalBundleAdjustment.cpp:463-499).
"""

from __future__ import annotations

import queue
import threading

from snakeslam_tpu.system.queues import DelayedQueue

_SENTINEL = object()


class AsyncPipeline:
    """Producer thread (IO + features + preprocess) -> bounded queue ->
    tracking on the calling thread."""

    def __init__(self, system, frame_source, depth: int = 2):
        self.system = system
        self.source = frame_source
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.error = None

    def _producer(self):
        try:
            for frame in self.source:
                self.q.put(frame)
        except Exception as e:  # surface producer failures to the consumer
            self.error = e
        finally:
            self.q.put(_SENTINEL)

    def run(self):
        t = threading.Thread(target=self._producer, name="input-pipeline",
                             daemon=True)
        t.start()
        n = 0
        while True:
            frame = self.q.get()
            if frame is _SENTINEL:
                break
            self.system.process_frame(frame)
            n += 1
        t.join(timeout=5.0)
        if self.error is not None:
            raise self.error
        return n


class AsyncLBA:
    """Run LocalBA on a worker thread behind a delayed queue
    (async_lba=true: LocalBundleAdjustment.cpp:23-24)."""

    def __init__(self, lba):
        self.lba = lba
        self.queue = DelayedQueue(lba.run, delay=0, parallel=True,
                                  name="lba")

    def add(self, kf: int):
        self.queue.add(kf, max_size=3)
        self.queue.update(kf)

    def join(self):
        self.queue.join()
