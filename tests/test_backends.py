"""Simplification, deferred mapper, and delayed-queue tests."""

import numpy as np
import pytest

from snakeslam_tpu.system.queues import DelayedQueue


def test_delayed_queue_sync_dispatch():
    done = []
    q = DelayedQueue(done.append, delay=2)
    for i in range(5):
        q.add(i)
        q.update(i)
    # with delay 2: after seeing item 4, items 0..2 are ready
    assert done == [0, 1, 2]
    q.force_clean()
    assert done == [0, 1, 2, 3, 4]


def test_delayed_queue_pause_resume():
    done = []
    q = DelayedQueue(done.append, delay=0)
    q.add(0)
    q.pause()
    q.update(0)
    assert done == []
    q.resume()
    q.update(0)
    assert done == [0]


def test_delayed_queue_async():
    import time

    done = []
    q = DelayedQueue(done.append, delay=0, parallel=True)
    for i in range(4):
        q.add(i)
        q.update(i)
    deadline = time.time() + 3.0
    while len(done) < 4 and time.time() < deadline:
        time.sleep(0.01)
    q.join()
    assert sorted(done) == [0, 1, 2, 3]


@pytest.mark.slow
def test_simplification_culls_redundant_keyframes():
    """A slow orbit with KFs forced frequently -> simplification removes
    redundant ones while tracking accuracy survives."""
    from snakeslam_tpu.frontend.synthetic_source import (
        apply_world_to_settings,
        synthetic_frames,
    )
    from snakeslam_tpu.system.settings import InputType, Settings
    from snakeslam_tpu.system.slam import SlamSystem
    from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory

    world = SyntheticWorld(n_points=3000, seed=31)
    settings = Settings()
    settings.input_type = InputType.Stereo
    settings.enable_imu = False
    settings.feature_slots = 1024
    settings.local_map_slots = 2048
    settings.lba_cam_slots = 24
    settings.lba_point_slots = 4096
    settings.lba_obs_slots = 8
    settings.th_depth = 25.0
    settings.th_map = 60  # aggressive simplification for the test
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)

    # slow motion: KFs come from the 0.5 s time rule and are highly redundant
    frames = list(synthetic_frames(
        world, orbit_trajectory(140, radius=7.0, arc=0.35),
        settings, noise_px=0.3,
    ))
    for f in frames:
        system.process_frame(f)
    system._simp_queue.force_clean()
    assert system.simplification.n_culled >= 1, "nothing culled"
    rmse, scale, n = system.ate_against_gt(with_scale=False)
    assert rmse < 0.05, f"ATE degraded after simplification: {rmse}"


@pytest.mark.slow
def test_deferred_mapper_runs_clean():
    from snakeslam_tpu.frontend.synthetic_source import (
        apply_world_to_settings,
        synthetic_frames,
    )
    from snakeslam_tpu.system.settings import InputType, Settings
    from snakeslam_tpu.system.slam import SlamSystem
    from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory

    world = SyntheticWorld(n_points=3000, seed=32)
    settings = Settings()
    settings.input_type = InputType.RGBD
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
        world, orbit_trajectory(120, radius=7.0, arc=0.8),
        settings, noise_px=0.4,
    ))
    for f in frames:
        system.process_frame(f)
    system._deferred_queue.force_clean()
    # the deferred mapper processed stabilized keyframes without breaking
    # the map or the trajectory
    rmse, scale, n = system.ate_against_gt(with_scale=False)
    assert rmse < 0.05, f"ATE after deferred mapping {rmse}"
