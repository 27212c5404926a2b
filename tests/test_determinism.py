"""Determinism + map-invariant tests (the reference's QA strategy:
async=false bit-reproducibility + Map::valid invariants, SURVEY.md §4)."""

import numpy as np
import pytest

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory


def _run(seed=61, n_frames=35):
    world = SyntheticWorld(n_points=3000, seed=seed)
    settings = Settings()
    settings.input_type = InputType.RGBD
    settings.enable_imu = False
    settings.random_seed = 3
    settings.feature_slots = 1024
    settings.local_map_slots = 2048
    settings.lba_cam_slots = 24
    settings.lba_point_slots = 4096
    settings.lba_obs_slots = 8
    settings.th_depth = 25.0
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)
    frames = list(synthetic_frames(
        world, orbit_trajectory(n_frames, radius=7.0, arc=0.5),
        settings, noise_px=0.3,
    ))
    for f in frames:
        system.process_frame(f)
    return system


@pytest.mark.slow
def test_deterministic_mode_reproduces_bitwise():
    """Two identical runs in deterministic (async=false) mode must produce
    identical trajectories and maps (README.md:53-60 semantics)."""
    a = _run()
    b = _run()
    pa = np.stack([f.pose_cw for f in a.tracker.trajectory])
    pb = np.stack([f.pose_cw for f in b.tracker.trajectory])
    assert pa.shape == pb.shape
    assert np.array_equal(pa, pb), "trajectories differ between runs"
    assert a.map.n_keyframes == b.map.n_keyframes
    assert a.map.n_points == b.map.n_points
    assert np.array_equal(a.map.pt_pos, b.map.pt_pos)


@pytest.mark.slow
def test_map_invariants_hold_during_run():
    system = _run(n_frames=30)
    errors = system.map.validate()
    assert errors == [], f"map invariants violated: {errors[:10]}"
    # and after the finalize passes
    system.finalize(gba_iterations=2)
    errors = system.map.validate()
    assert errors == [], f"post-finalize violations: {errors[:10]}"


def _run_windowed(seed=61, n_frames=48):
    from snakeslam_tpu.tracking.windowed import WindowedRunner

    world = SyntheticWorld(n_points=3000, seed=seed)
    settings = Settings()
    settings.input_type = InputType.RGBD
    settings.enable_imu = False
    settings.random_seed = 3
    settings.feature_slots = 1024
    settings.local_map_slots = 2048
    settings.lba_cam_slots = 24
    settings.lba_point_slots = 4096
    settings.lba_obs_slots = 8
    settings.th_depth = 25.0
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)
    frames = list(synthetic_frames(
        world, orbit_trajectory(n_frames, radius=7.0, arc=0.5),
        settings, noise_px=0.3,
    ))
    WindowedRunner(system, window=8, two_stage=True).run(frames)
    return system


@pytest.mark.slow
def test_windowed_deferred_mode_reproduces_bitwise():
    """The windowed runner's deferred keyframe back-ends flush at a fixed
    point in the loop, so the mode stays bit-reproducible."""
    a = _run_windowed()
    b = _run_windowed()
    ta = np.stack([f.pose_cw for f in a.tracker.trajectory])
    tb = np.stack([f.pose_cw for f in b.tracker.trajectory])
    assert len(ta) == len(tb)
    assert np.array_equal(ta, tb), "windowed trajectories must be bitwise equal"
    assert np.array_equal(a.map.pt_pos[a.map.pt_valid],
                          b.map.pt_pos[b.map.pt_valid])
    a.map.validate()
