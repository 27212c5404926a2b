"""Windowed tracking with IMU: gyro-predicted poses inside the scan."""

import numpy as np
import pytest

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.tracking.windowed import (
    WindowedRunner,
    gyro_delta_rotation,
)
from snakeslam_tpu.utils.imu_synthetic import orbit_pose_wb, synth_imu
from snakeslam_tpu.utils.synthetic import SyntheticWorld


def test_gyro_delta_rotation_matches_pose_delta():
    # integrate exact gyro between two trajectory samples
    t0, t1 = 1.0, 1.25
    imu = synth_imu(orbit_pose_wb, t0 - 0.005, t1 + 0.005, rate=400.0)
    sel = (imu["t"] >= t0) & (imu["t"] < t1)
    dR = gyro_delta_rotation(imu["omega"][sel], imu["dt"][sel], np.zeros(3))
    R0, _ = orbit_pose_wb(t0)
    R1, _ = orbit_pose_wb(t1)
    dR_true = R0.T @ R1
    assert np.abs(dR - dR_true).max() < 5e-3


@pytest.mark.slow
def test_windowed_mono_vi_tracks():
    n_frames = 120
    fps = 10.0
    bg_true = np.array([0.01, -0.008, 0.012])
    settings = Settings()
    settings.input_type = InputType.Mono
    settings.enable_imu = True
    settings.feature_slots = 1024
    settings.local_map_slots = 2048
    settings.lba_cam_slots = 24
    settings.lba_point_slots = 4096
    settings.lba_obs_slots = 8
    world = SyntheticWorld(n_points=3000, seed=5)
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)

    def traj(n, fps=10.0):
        for i in range(n):
            t = i / fps
            R, p = orbit_pose_wb(t)
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = p
            yield t, np.linalg.inv(T)

    imu = synth_imu(orbit_pose_wb, 0.0, n_frames / fps, rate=200.0,
                    bg=bg_true, gyro_noise=1e-4, acc_noise=1e-3)
    frames = list(synthetic_frames(
        world, traj(n_frames, fps), settings, noise_px=0.3, imu=imu,
    ))
    runner = WindowedRunner(system, window=8, two_stage=True)
    runner.run(frames)

    sol = system.imu_solver
    assert sol.gyro_initialized, "gyro bias never initialized"
    assert np.abs(sol.bg - bg_true).max() < 5e-3, f"bg {sol.bg}"
    assert sol.gravity_initialized, "gravity/scale never initialized"
    rmse, scale, n = system.ate_against_gt(with_scale=True)
    assert rmse < 0.1, f"Sim3 ATE {rmse}"
    assert abs(scale - 1.0) < 0.12, f"metric scale error: {scale}"
    # the windowed path actually ran (device batches were consumed)
    assert runner.n_device_calls > 0
