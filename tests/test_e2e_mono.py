"""End-to-end monocular pipeline: two-frame bootstrap + tracking + Sim3 ATE."""

import numpy as np
import pytest

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory


def _mono_system(n_frames=50, seed=11):
    settings = Settings()
    settings.input_type = InputType.Mono
    settings.feature_slots = 1024
    settings.local_map_slots = 2048
    settings.lba_cam_slots = 24
    settings.lba_point_slots = 4096
    settings.lba_obs_slots = 8
    world = SyntheticWorld(n_points=3000, seed=seed)
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)
    frames = list(synthetic_frames(
        world, orbit_trajectory(n_frames, radius=7.0, arc=0.9),
        settings, noise_px=0.3,
    ))
    return system, frames


@pytest.mark.slow
def test_mono_initializes_and_tracks():
    system, frames = _mono_system()
    init_at = -1
    for f in frames:
        st = system.process_frame(f)
        if init_at < 0 and system.map.n_keyframes >= 2:
            init_at = f.frame_id
    assert init_at >= 0, "mono init never succeeded"
    assert init_at < 25, f"mono init too late: {init_at}"
    n_tracked = len(system.tracker.trajectory)
    assert n_tracked >= len(frames) - init_at - 2

    # monocular scale is arbitrary -> Sim3 ATE
    rmse, scale, n = system.ate_against_gt(with_scale=True)
    assert n >= 20
    assert rmse < 0.05, f"Sim3 ATE {rmse}"
    # the initializer normalizes median depth to ~3 -> scale far from 1
    assert not np.isclose(scale, 0.0)


@pytest.mark.slow
def test_mono_rejects_pure_rotation():
    """Rotation-only motion must not initialize (homography/parallax gates)."""
    from snakeslam_tpu.utils.synthetic import lookat_pose_cw

    settings = Settings()
    settings.input_type = InputType.Mono
    settings.feature_slots = 1024
    settings.local_map_slots = 1024
    world = SyntheticWorld(n_points=2000, seed=3)
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)

    from snakeslam_tpu.frontend.synthetic_source import synthetic_frames

    def rot_only(n):
        eye = np.array([0.0, 0.0, -7.0])
        for i in range(n):
            a = 0.003 * i
            target = np.array([np.sin(a) * 5, 0.0, -7.0 + np.cos(a) * 5])
            yield i / 20.0, lookat_pose_cw(eye, target)

    for f in synthetic_frames(world, rot_only(15), settings, noise_px=0.3):
        system.process_frame(f)
    assert system.map.n_keyframes == 0
