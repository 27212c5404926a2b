"""Profile the windowed pipeline: per-phase wall time breakdown."""
import os
import time

import numpy as np

os.environ.setdefault("BENCH_FRAMES", "400")

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.tracking.windowed import WindowedRunner
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory


def build(seed, count, async_mode=None):
    if async_mode is None:
        async_mode = os.environ.get("BENCH_ASYNC", "0") == "1"
    workload = os.environ.get("BENCH_WORKLOAD", "smooth")
    settings = Settings()
    settings.input_type = InputType.Stereo
    settings.enable_imu = False
    settings.async_mode = async_mode
    settings.feature_slots = 1024
    settings.local_map_slots = 4096
    settings.lba_cam_slots = 32
    settings.lba_point_slots = 8192
    settings.lba_obs_slots = 8
    settings.th_depth = 25.0
    if workload == "smooth":
        # mirror bench._build_smooth: pinned snapshot buckets (no mid-run
        # bucket-growth recompiles)
        settings.local_map_slots = 2048
        settings.pin_local_map_bucket = True
    if workload == "loop":
        from snakeslam_tpu.utils.synthetic import loop_trajectory

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
    world = SyntheticWorld(n_points=6000, seed=seed)
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)
    frames = list(synthetic_frames(
        world, orbit_trajectory(count, radius=7.0, arc=1.2 * count / 400.0,
                                fps=200.0),
        settings, noise_px=0.3,
    ))
    return system, frames


def main():
    W = int(os.environ.get("BENCH_WINDOW", 64))
    n_frames = int(os.environ.get("BENCH_FRAMES", 400))

    t0 = time.perf_counter()
    system, frames = build(123, 48)
    for f in frames:
        f.timestamp = f.frame_id / 10.0
    print(f"build+frames: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    WindowedRunner(system, window=W).run(frames)
    print(f"warmup run: {time.perf_counter()-t0:.1f}s", flush=True)

    # instrumented timed run
    system, frames = build(7, n_frames)
    runner = WindowedRunner(system, window=W)

    orig_dispatch = runner._dispatch
    orig_fetch_cls = type(runner)
    times = {"dispatch": 0.0, "fetch": 0.0, "consume": 0.0, "other": 0.0}
    counts = {"dispatch": 0, "fetch": 0}

    def timed_dispatch(*a, **kw):
        t = time.perf_counter()
        r = orig_dispatch(*a, **kw)
        times["dispatch"] += time.perf_counter() - t
        counts["dispatch"] += 1
        return r

    runner._dispatch = timed_dispatch

    orig_consume = runner._consume

    for name in ("_drain", "_local_map", "_initial_dec_state", "_idle"):
        times[name] = 0.0
        counts[name] = 0

        def _mk(nm, orig):
            def f(*a, **kw):
                t = time.perf_counter()
                r = orig(*a, **kw)
                times[nm] += time.perf_counter() - t
                counts[nm] += 1
                return r
            return f

        setattr(runner, name, _mk(name, getattr(runner, name)))

    for name in ("_dispatch_backend_cycles", "_commit_backend"):
        times[name] = 0.0
        counts[name] = 0

        def _mk2(nm, orig):
            def f(*a, **kw):
                t = time.perf_counter()
                r = orig(*a, **kw)
                times[nm] += time.perf_counter() - t
                counts[nm] += 1
                return r
            return f

        setattr(runner, name, _mk2(name, getattr(runner, name)))

    times["process_frame"] = 0.0
    counts["process_frame"] = 0
    orig_pf = system.process_frame

    def timed_pf(*a, **kw):
        t = time.perf_counter()
        r = orig_pf(*a, **kw)
        times["process_frame"] += time.perf_counter() - t
        counts["process_frame"] += 1
        return r

    system.process_frame = timed_pf

    lm = system.tracker.local_mapper
    times["flush_deferred"] = 0.0
    counts["flush_deferred"] = 0
    orig_fd = lm.flush_deferred

    def timed_fd(*a, **kw):
        t = time.perf_counter()
        r = orig_fd(*a, **kw)
        times["flush_deferred"] += time.perf_counter() - t
        counts["flush_deferred"] += 1
        return r

    lm.flush_deferred = timed_fd

    # back-end cycle internals (what _dispatch/_commit_backend decompose to)
    for nm, obj, meth in [
        ("bk_dispatch_deferred", lm, "dispatch_deferred"),
        ("bk_commit_deferred", lm, "commit_deferred"),
    ] + [(f"bk_{type(b).__name__}.add", b, "add") for b in lm.backends]:
        times[nm] = 0.0
        counts[nm] = 0

        def _mk3(nm, orig):
            def f(*a, **kw):
                t = time.perf_counter()
                r = orig(*a, **kw)
                times[nm] += time.perf_counter() - t
                counts[nm] += 1
                return r
            return f

        setattr(obj, meth, _mk3(nm, getattr(obj, meth)))

    def timed_consume(*a, **kw):
        t = time.perf_counter()
        r = orig_consume(*a, **kw)
        times["consume"] += time.perf_counter() - t
        return r

    runner._consume = timed_consume

    import snakeslam_tpu.tracking.windowed as WMOD
    orig_f = WMOD._InFlight.fetch

    def timed_f(self):
        t = time.perf_counter()
        r = orig_f(self)
        times["fetch"] += time.perf_counter() - t
        counts["fetch"] += 1
        return r

    WMOD._InFlight.fetch = timed_f

    cprof = os.environ.get("PROFILE_CPROF", "0") == "1"
    t0 = time.perf_counter()
    if cprof:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        runner.run(frames)
        pr.disable()
        wall = time.perf_counter() - t0
        pstats.Stats(pr).sort_stats("cumulative").print_stats(30)
    else:
        runner.run(frames)
        wall = time.perf_counter() - t0
    n_tracked = len(system.tracker.trajectory)
    print(f"timed run: {wall:.2f}s  tracked={n_tracked} "
          f"fps={n_tracked/wall:.1f}", flush=True)
    print(f"  dispatch: {times['dispatch']:.2f}s ({counts['dispatch']}x)")
    print(f"  fetch:    {times['fetch']:.2f}s ({counts['fetch']}x)")
    print(f"  consume:  {times['consume']:.2f}s")
    for name in sorted(times):
        if name in ("dispatch", "fetch", "consume", "other"):
            continue
        print(f"  {name}: {times[name]:.2f}s ({counts.get(name, 0)}x)")
    print(f"  unattributed: "
          f"{wall - times['dispatch'] - times['fetch'] - times['consume'] - times['_drain'] - times['_local_map'] - times['_initial_dec_state']:.2f}s")
    print(f"  device_calls={runner.n_device_calls} "
          f"kf={system.map.n_keyframes} pts={system.map.n_points}")


if __name__ == "__main__":
    main()
