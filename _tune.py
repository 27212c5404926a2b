import time, sys
import numpy as np
from snakeslam_tpu.frontend.synthetic_source import apply_world_to_settings, synthetic_frames
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.tracking.windowed import WindowedRunner
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
    frames = list(synthetic_frames(world, orbit_trajectory(count, radius=7.0, arc=1.2*count/400.0, fps=200.0), settings, noise_px=0.3))
    return system, frames

configs = [(64, True, 3), (32, True, 3), (32, True, 5), (64, False, 3), (32, False, 5), (64, True, 5)]
# warmup each config once (compile)
for W, two, d in configs:
    system, frames = build(123, 48)
    for f2 in frames: f2.timestamp = f2.frame_id / 10.0
    WindowedRunner(system, window=W, two_stage=two, depth=d).run(frames)

for W, two, d in configs:
    best = 1e9
    for r in range(4):
        system, frames = build(7, 400)
        runner = WindowedRunner(system, window=W, two_stage=two, depth=d)
        t0 = time.perf_counter()
        runner.run(frames)
        wall = time.perf_counter()-t0
        best = min(best, wall)
    rmse, scale, n = system.ate_against_gt(with_scale=False)
    print(f"W={W} two_stage={two} depth={d}: best {400/best:.1f} fps  ate={rmse*1000:.2f}mm")
