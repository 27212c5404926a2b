"""End-to-end pipeline test: synthetic RGBD sequence -> trajectory ATE.

The minimum end-to-end slice of SURVEY.md §7 step 5: single-frame bootstrap,
coarse/fine tracking, keyframe decision, stereo point insertion,
triangulation, windowed LBA, final GBA — feature-level synthetic input.
"""

import numpy as np
import pytest

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory


def _run_sequence(input_type, n_frames=40, noise_px=0.3, seed=7):
    settings = Settings()
    settings.input_type = input_type
    # small synthetic capacities for test speed
    settings.feature_slots = 1024
    settings.local_map_slots = 2048
    settings.lba_cam_slots = 24
    settings.lba_point_slots = 4096
    settings.lba_obs_slots = 8
    settings.th_depth = 25.0
    world = SyntheticWorld(n_points=3000, seed=seed)
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)
    frames = list(synthetic_frames(
        world, orbit_trajectory(n_frames, radius=7.0, arc=0.8),
        settings, noise_px=noise_px,
    ))
    for f in frames:
        system.process_frame(f)
    return system, frames


@pytest.mark.slow
def test_rgbd_sequence_tracks():
    system, frames = _run_sequence(InputType.RGBD)
    n_tracked = len(system.tracker.trajectory)
    assert n_tracked >= len(frames) - 2, f"only tracked {n_tracked}"
    assert system.map.n_keyframes >= 3
    rmse, scale, n = system.ate_against_gt(with_scale=False)
    assert n >= len(frames) - 2
    assert rmse < 0.05, f"ATE {rmse}"

    # finalize improves or keeps the trajectory quality
    system.finalize(gba_iterations=3)
    rmse_kf = _kf_ate(system)
    assert rmse_kf < 0.05, f"KF ATE after GBA {rmse_kf}"


def _kf_ate(system):
    from snakeslam_tpu.core.trajectory import ate_rmse

    ks = system.map.valid_keyframes()
    est, gt = [], []
    frame_by_id = {f.frame_id: f for f in system.tracker.trajectory}
    for k in ks:
        fid = int(system.map.kf_frame_id[k])
        f = frame_by_id.get(fid)
        if f is None or f.gt_pose_cw is None:
            continue
        est.append(np.linalg.inv(system.map.kf_pose[k])[:3, 3])
        gt.append(np.linalg.inv(f.gt_pose_cw)[:3, 3])
    rmse, _ = ate_rmse(np.array(est), np.array(gt), with_scale=False)
    return rmse


@pytest.mark.slow
def test_stereo_sequence_tracks():
    system, frames = _run_sequence(InputType.Stereo)
    n_tracked = len(system.tracker.trajectory)
    assert n_tracked >= len(frames) - 2
    rmse, scale, n = system.ate_against_gt(with_scale=False)
    assert rmse < 0.05, f"ATE {rmse}"


@pytest.mark.slow
def test_tum_trajectory_export(tmp_path):
    system, frames = _run_sequence(InputType.RGBD, n_frames=12)
    system.write_trajectories(tmp_path)
    out = tmp_path / "trajectory_frames_ba.tum"
    assert out.exists()
    from snakeslam_tpu.core.trajectory import read_tum

    ts, pos, quat = read_tum(out)
    assert len(ts) >= 10
