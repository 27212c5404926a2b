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

import threading

from snakeslam_tpu.system.queues import DelayedQueue
from snakeslam_tpu.utils.native import NativeChannel

_SENTINEL = "__snakert_sentinel__"


class AsyncPipeline:
    """Producer thread (IO + features + preprocess) -> bounded native SPSC
    channel -> tracking on the calling thread.  The 2-deep hand-off mirrors
    the reference's SynchronizedBuffer depth (Input.h:48)."""

    def __init__(self, system, frame_source, depth: int = 2):
        self.system = system
        self.source = frame_source
        self.channel = NativeChannel(capacity=depth)
        self.error = None

    def _producer(self):
        try:
            for frame in self.source:
                if not self.channel.push(frame, timeout_ms=600_000):
                    return
        except Exception as e:  # surface producer failures to the consumer
            self.error = e
        finally:
            self.channel.push(_SENTINEL, timeout_ms=600_000)

    def run(self):
        t = threading.Thread(target=self._producer, name="input-pipeline",
                             daemon=True)
        t.start()
        n = 0
        while True:
            frame = self.channel.pop(timeout_ms=600_000)
            if frame is None or (isinstance(frame, str)
                                 and frame == _SENTINEL):
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
