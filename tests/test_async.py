"""Async pipeline mode: threaded front-end + async LBA stay correct."""

import numpy as np
import pytest

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory


@pytest.mark.slow
def test_async_pipeline_matches_sync_quality():
    world = SyntheticWorld(n_points=3000, seed=51)
    settings = Settings()
    settings.input_type = InputType.Stereo
    settings.enable_imu = False
    settings.async_mode = True
    settings.async_lba = True
    settings.feature_slots = 1024
    settings.local_map_slots = 2048
    settings.lba_cam_slots = 24
    settings.lba_point_slots = 4096
    settings.lba_obs_slots = 8
    settings.th_depth = 25.0
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)
    frames = synthetic_frames(
        world, orbit_trajectory(50, radius=7.0, arc=0.6),
        settings, noise_px=0.3,
    )
    wall = system.run(frames)
    n_tracked = len(system.tracker.trajectory)
    assert n_tracked >= 48, f"async tracked only {n_tracked}"
    rmse, scale, n = system.ate_against_gt(with_scale=False)
    assert rmse < 0.05, f"async ATE {rmse}"
    # LBA actually ran on the worker
    assert system.lba.n_runs >= 1
