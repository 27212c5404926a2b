"""End-to-end monocular-inertial pipeline: VI init recovers metric scale."""

import numpy as np
import pytest

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.utils.imu_synthetic import orbit_pose_wb, synth_imu
from snakeslam_tpu.utils.synthetic import SyntheticWorld


def _camera_trajectory(n_frames, fps=10.0):
    for i in range(n_frames):
        t = i / fps
        R_wb, p = orbit_pose_wb(t)
        T_wc = np.eye(4)
        T_wc[:3, :3] = R_wb
        T_wc[:3, 3] = p
        yield t, np.linalg.inv(T_wc)


@pytest.mark.slow
def test_mono_vi_recovers_scale_and_gravity():
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

    imu = synth_imu(orbit_pose_wb, 0.0, n_frames / fps, rate=200.0,
                    bg=bg_true, gyro_noise=1e-4, acc_noise=1e-3)
    frames = list(synthetic_frames(
        world, _camera_trajectory(n_frames, fps), settings,
        noise_px=0.3, imu=imu,
    ))
    for f in frames:
        system.process_frame(f)

    sol = system.imu_solver
    assert sol is not None
    assert sol.gyro_initialized, "gyro bias never initialized"
    assert np.abs(sol.bg - bg_true).max() < 5e-3, f"bg {sol.bg}"
    assert sol.gravity_initialized, "gravity/scale never initialized"

    # after scale/gravity init, the map should be metric: SE3 (no-scale) ATE
    rmse, scale, n = system.ate_against_gt(with_scale=True)
    assert rmse < 0.08, f"Sim3 ATE {rmse}"
    # Sim3 alignment scale ~ 1 <=> map is metric
    assert abs(scale - 1.0) < 0.1, f"metric scale error: align scale {scale}"

    # gravity in map frame is canonical -z after the alignment: compare the
    # estimated world 'down' with ground truth via the frame poses
    # (both should agree up to the alignment rotation; the ATE test above
    # already covers consistency)
    assert sol.stage.name in ("OPTIMIZING", "DONE")

    # final visual-inertial alternation (IterateBaImu, System.cpp:190-200
    # + ImuStateSolver.cpp:469-484): finalize must not degrade — and
    # should typically improve — keyframe accuracy and metric scale
    kf_rmse_before, kf_scale_before = _keyframe_ate(system)
    system.finalize(gba_iterations=2, vi_alternations=3)
    kf_rmse_after, kf_scale_after = _keyframe_ate(system)
    assert kf_rmse_after < max(kf_rmse_before * 1.10, 0.005), (
        f"IterateBaImu degraded KF ATE: {kf_rmse_before} -> {kf_rmse_after}"
    )
    assert abs(kf_scale_after - 1.0) <= abs(kf_scale_before - 1.0) + 0.02, (
        f"IterateBaImu degraded scale: {kf_scale_before} -> {kf_scale_after}"
    )


def _keyframe_ate(system):
    rmse, scale, n = system.ate_against_gt(with_scale=True)
    return rmse, scale
