"""Windowed tracking: quality parity with the per-frame path."""

import numpy as np
import pytest

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.tracking.windowed import WindowedRunner
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory


@pytest.mark.slow
def test_windowed_matches_per_frame_quality():
    world = SyntheticWorld(n_points=3000, seed=71)
    settings = Settings()
    settings.input_type = InputType.Stereo
    settings.enable_imu = False
    settings.feature_slots = 1024
    settings.local_map_slots = 2048
    settings.lba_cam_slots = 24
    settings.lba_point_slots = 4096
    settings.lba_obs_slots = 8
    settings.th_depth = 25.0
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)
    frames = list(synthetic_frames(
        world, orbit_trajectory(80, radius=7.0, arc=0.8),
        settings, noise_px=0.3,
    ))
    runner = WindowedRunner(system, window=8)
    runner.run(frames)

    n_tracked = len(system.tracker.trajectory)
    assert n_tracked >= 76, f"windowed tracked only {n_tracked}"
    assert system.map.n_keyframes >= 3
    rmse, scale, n = system.ate_against_gt(with_scale=False)
    assert rmse < 0.02, f"windowed ATE {rmse}"
    # the point of the window path: far fewer device calls than frames
    assert runner.n_device_calls <= len(frames)
