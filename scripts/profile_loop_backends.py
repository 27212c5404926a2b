"""Fine-grained timing of the per-keyframe back-ends on the loop workload.

The window profiler showed LoopClosing.add at ~350 ms/KF and the queue
back-ends (simplification, deferred mapper) at ~80 ms each on the loop
bench lane — this breaks those down to the individual stages (BoW scoring,
candidate matching, Sim3 RANSAC, verify, relink/refuse/retriangulate) and
counts device round trips per call.
"""
import os
import time
from collections import defaultdict

import numpy as np

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.tracking.windowed import WindowedRunner
from snakeslam_tpu.utils.synthetic import SyntheticWorld, loop_trajectory

TIMES = defaultdict(float)
COUNTS = defaultdict(int)


def wrap(obj, meth, label=None):
    nm = label or f"{type(obj).__name__}.{meth}"
    orig = getattr(obj, meth)

    def f(*a, **kw):
        t = time.perf_counter()
        r = orig(*a, **kw)
        TIMES[nm] += time.perf_counter() - t
        COUNTS[nm] += 1
        return r

    setattr(obj, meth, f)


def build(seed, count):
    settings = Settings()
    settings.input_type = InputType.Stereo
    settings.enable_imu = False
    settings.feature_slots = 1024
    settings.local_map_slots = 4096
    settings.lba_cam_slots = 32
    settings.lba_point_slots = 8192
    settings.lba_obs_slots = 8
    settings.th_depth = 25.0
    settings.pin_local_map_bucket = True
    settings.th_map = 400
    world = SyntheticWorld(n_points=60000, seed=seed)
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)
    frames = list(synthetic_frames(
        world, loop_trajectory(count, radius=7.0, fps=200.0),
        settings, noise_px=0.3,
    ))
    return system, frames


def main():
    W = int(os.environ.get("BENCH_WINDOW", 64))
    t0 = time.perf_counter()
    system, frames = build(7, 400)
    WindowedRunner(system, window=W).run(frames)
    print(f"warmup: {time.perf_counter()-t0:.1f}s", flush=True)

    system, frames = build(7, 400)
    lc = system.loop_closing
    for meth in ("_detect", "_compute_sim3", "_verify_sim3",
                 "_match_points", "_correct_loop"):
        if hasattr(lc, meth):
            wrap(lc, meth, f"loop.{meth}")
    wrap(lc.db, "add", "db.add")
    wrap(lc.db, "detect_loop_candidates", "db.detect_candidates")
    lm = system.tracker.local_mapper
    wrap(system.simplification, "add", "simplification.process")
    wrap(system.deferred_mapper, "add", "deferred_mapper.process")
    runner = WindowedRunner(system, window=W)
    t0 = time.perf_counter()
    runner.run(frames)
    wall = time.perf_counter() - t0
    n = len(system.tracker.trajectory)
    print(f"timed: {wall:.2f}s fps={n/wall:.1f} kf={system.map.n_keyframes} "
          f"loops={lc.n_loops_closed}", flush=True)
    for k in sorted(TIMES, key=TIMES.get, reverse=True):
        print(f"  {k:36s} {TIMES[k]:7.2f}s  ({COUNTS[k]}x, "
              f"{TIMES[k]/max(COUNTS[k],1)*1000:6.1f} ms avg)")


if __name__ == "__main__":
    main()
