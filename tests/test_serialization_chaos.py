"""Map checkpoint/resume, viewer export, chaos-hook recovery tests."""

import numpy as np
import pytest

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.map.chaos import Chaos
from snakeslam_tpu.map.serialization import export_scene, load_map, save_map
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory
from snakeslam_tpu.viewer.export import export_viewer_snapshot


def _small_system(n_frames=40, seed=41):
    world = SyntheticWorld(n_points=3000, seed=seed)
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
        world, orbit_trajectory(n_frames, radius=7.0, arc=0.6),
        settings, noise_px=0.3,
    ))
    for f in frames:
        system.process_frame(f)
    return system, frames, settings


@pytest.mark.slow
def test_map_checkpoint_roundtrip(tmp_path):
    system, frames, settings = _small_system()
    smap = system.map
    save_map(smap, tmp_path / "map.npz")
    restored = load_map(tmp_path / "map.npz")
    assert restored.n_keyframes == smap.n_keyframes
    assert restored.n_points == smap.n_points
    assert np.array_equal(restored.kf_pose, smap.kf_pose)
    assert np.array_equal(restored.pt_pos, smap.pt_pos)
    assert np.array_equal(restored.pt_obs_kf, smap.pt_obs_kf)
    # the restored map supports further mutation
    ks = restored.valid_keyframes()
    assert len(restored.keyframe_points(int(ks[-1]))) > 0

    export_scene(smap, tmp_path / "scene.npz")
    z = np.load(tmp_path / "scene.npz")
    assert len(z["points"]) == smap.n_points


@pytest.mark.slow
def test_viewer_export(tmp_path):
    system, frames, settings = _small_system(n_frames=25)
    snap = export_viewer_snapshot(system.map, tmp_path, tag="m")
    assert (tmp_path / "m.ply").exists()
    assert (tmp_path / "m.npz").exists()
    assert len(snap.points) == system.map.n_points
    assert len(snap.keyframe_poses) == system.map.n_keyframes
    head = (tmp_path / "m.ply").read_text().splitlines()[:2]
    assert head[0] == "ply"
    # offline PNG rendering (SnakeOpenGLViewer headless analog)
    from snakeslam_tpu.viewer.plot import plot_map

    png = plot_map(system.map, tmp_path / "m_map.png",
                   trajectory=system.tracker.trajectory)
    assert png.exists() and png.stat().st_size > 5000


@pytest.mark.slow
def test_chaos_recovery():
    """Random point/observation removal must not break tracking."""
    world = SyntheticWorld(n_points=3000, seed=42)
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
    chaos = Chaos(system.map, seed=1)
    frames = list(synthetic_frames(
        world, orbit_trajectory(60, radius=7.0, arc=0.6),
        settings, noise_px=0.3,
    ))
    for i, f in enumerate(frames):
        system.process_frame(f)
        if i == 25:
            chaos.remove_random_point(n=100)
            chaos.remove_random_observation(n=100)
        if i == 35 and system.map.n_keyframes >= 4:
            chaos.remove_random_keyframe()
    n_tracked = len(system.tracker.trajectory)
    assert n_tracked >= len(frames) - 3
    rmse, scale, n = system.ate_against_gt(with_scale=False)
    assert rmse < 0.05, f"ATE after chaos {rmse}"
