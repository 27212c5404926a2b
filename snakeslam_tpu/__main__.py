"""CLI entry point: ``python -m snakeslam_tpu <config.ini> [options]``.

Mirrors the reference's ``snake_slam <config.ini> [--dataset --name
--outDir]`` (reference: Snake/main.cpp:29-44): load settings (with
write-back of missing defaults), apply per-dataset presets and CLI
overrides, run the system over the dataset, write TUM trajectories, print
the statistics tables.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser(prog="snakeslam_tpu")
    ap.add_argument("config", help="INI config file (created if missing)")
    ap.add_argument("--dataset", default=None, help="dataset directory")
    ap.add_argument("--name", default=None, help="output file prefix")
    ap.add_argument("--outDir", default=None, help="evaluation output dir")
    ap.add_argument("--maxFrames", type=int, default=None)
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax profiler trace of the run into "
                         "<outDir>/trace (view with TensorBoard/xprof)")
    ap.add_argument("--overlayEvery", type=int, default=0,
                    help="export a feature-overlay PNG every N tracked "
                         "frames into <outDir>/frames (the headless "
                         "viewer-frame stream; 0 = off)")
    args = ap.parse_args(argv)

    from snakeslam_tpu.system.settings import Settings
    from snakeslam_tpu.system.slam import SlamSystem
    from snakeslam_tpu.frontend.input import Input

    settings = Settings.from_ini(args.config)
    settings.set_default_parameters_for_dataset()
    if args.dataset:
        settings.dataset.dataset_dir = args.dataset
    if args.name:
        settings.out_file_prefix = args.name
    if args.outDir:
        settings.eval_dir = args.outDir
    if args.maxFrames is not None:
        settings.dataset.max_frames = args.maxFrames
    if not settings.dataset.dataset_dir:
        print("no dataset directory configured", file=sys.stderr)
        return 2

    inp = Input(settings, dataset_root=settings.dataset.dataset_dir)
    system = SlamSystem(settings)
    if args.overlayEvery > 0:
        from snakeslam_tpu.viewer.export import FrameOverlayWriter

        writer = FrameOverlayWriter(
            Path(settings.eval_dir) / "frames", every_n=args.overlayEvery,
            size=(settings.width, settings.height))
        system.frame_listeners.append(writer.on_frame)
    if args.profile:
        # device+host trace (the reference's per-module PerformanceStats
        # tables cover wall time; this exposes the XLA op timeline)
        import contextlib

        import jax

        trace_dir = str(Path(settings.eval_dir) / "trace")
        profile_cm = jax.profiler.trace(trace_dir)
    else:
        import contextlib

        profile_cm = contextlib.nullcontext()
    with profile_cm:
        wall = system.run(iter(inp))

    out_dir = Path(settings.eval_dir)
    system.write_trajectories(out_dir)
    from snakeslam_tpu.viewer.export import export_viewer_snapshot

    export_viewer_snapshot(system.map, out_dir, tag=settings.out_file_prefix)
    try:
        from snakeslam_tpu.viewer.plot import plot_map

        plot_map(system.map,
                 out_dir / f"{settings.out_file_prefix}_map.png",
                 trajectory=system.tracker.trajectory,
                 title=settings.out_file_prefix)
    except Exception as e:  # matplotlib optional
        print(f"map plot skipped: {e}", file=sys.stderr)
    n = len(system.tracker.trajectory)
    print(f"tracked {n} frames in {wall:.1f}s "
          f"({n / max(wall, 1e-9):.1f} fps)")
    print(f"keyframes: {system.map.n_keyframes}  "
          f"points: {system.map.n_points}")
    print(system.stats.table())
    print(system.map_statistics())
    return 0


if __name__ == "__main__":
    sys.exit(main())
