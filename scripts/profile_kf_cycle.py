"""Stage-level breakdown of one keyframe back-end cycle.

Times host staging vs device dispatch vs blocking fetch vs host commit for
triangulation / fusion / LBA, plus the further back-ends (simplification,
loop closing), at bench shapes.  This is the 85 ms kf_cycle_ms under a
microscope.
"""
import time

import numpy as np

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.tracking.windowed import WindowedRunner
from snakeslam_tpu.utils.fetch import fetch_list
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory


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
    system, frames = build(123, 120)
    for f in frames:
        f.timestamp = f.frame_id / 10.0  # dense keyframes
    WindowedRunner(system, window=64).run(frames)
    lm = system.tracker.local_mapper
    kf = int(system.tracker.last_kf)
    print(f"kf={kf} n_kf={system.map.n_keyframes} pts={system.map.n_points}",
          flush=True)

    def t(label, fn, reps=5):
        outs = []
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            outs.append(fn())
            times.append(time.perf_counter() - t0)
        print(f"  {label:32s} {np.median(times)*1e3:8.1f} ms", flush=True)
        return outs[-1]

    print("-- dispatch halves (host staging + async device dispatch):")
    t("cull_recent_points", lambda: lm._cull_recent_points(kf))
    tri = t("tri_dispatch", lambda: lm._tri_dispatch(kf))
    fuse = t("fusion dispatch", lambda: lm.map_searcher.dispatch(kf))
    ba = t("lba dispatch", lambda: lm.lba.dispatch(kf))

    print("-- blocking fetch (all three cycles' arrays):")

    def fetch_all():
        arrays = [tri[0]["valid"], tri[0]["match_b"], tri[0]["point"]]
        arrays += fuse[0]
        arrays += ba[0]
        return fetch_list(arrays)

    fetched = t("fetch all", fetch_all)

    print("-- host commits:")
    nf = len(fuse[0])
    t("tri_commit", lambda: lm._tri_commit(
        kf, fetched[0], fetched[1], fetched[2].astype(np.float64), tri[1]),
      reps=1)
    t("fuse commit", lambda: lm.map_searcher.commit(kf, fetched[3:3 + nf],
                                                    fuse[1]), reps=1)
    t("update_points_bulk",
      lambda: lm.map.update_points_bulk(lm.map.keyframe_points(kf)))
    t("lba commit", lambda: lm.lba.commit(kf, fetched[3 + nf:], ba[1],
                                          check_state=False), reps=1)

    print("-- further back-ends (queue add):")
    for b in lm.backends:
        t(type(b).__name__ + ".add", lambda: b.add(kf), reps=1)

    print("-- lba sub-stages:")
    win = t("lba select_window", lambda: lm.lba.select_window(kf))
    t("lba pack", lambda: lm.lba.pack(*win))
    import jax

    from snakeslam_tpu.ops import ba as BA
    problem, aux = lm.lba.pack(*win)

    def solve_block():
        out = BA.solve_ba(problem, lm.lba.cam, lm.lba.bf, iterations=3)
        jax.block_until_ready(out)
        return out

    t("lba solve (dispatch+block)", solve_block)

    print("-- tri sub-stages:")
    t("kf_feature_pool sync",
      lambda: lm.map.kf_feature_pool(lm.s.feature_slots).slots_for([kf]))
    from snakeslam_tpu.ops.depth_grid import keyframe_depth_grid
    t("keyframe_depth_grid",
      lambda: keyframe_depth_grid(lm.map, kf, lm.s.width, lm.s.height))

    # insert_keyframe sync half on a fresh frame: approximate with
    # association re-run
    print("-- insert sync half:")
    fr = system.tracker.last_frame
    t("associate_observations", lambda: lm._associate_observations(kf, fr),
      reps=1)


if __name__ == "__main__":
    main()
