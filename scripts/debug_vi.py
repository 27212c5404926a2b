"""Diagnose the windowed mono-VI test scenario (test_windowed_vi.py).

Runs the exact test workload with per-stage VI diagnostics: gyro/gravity
init timing, scale estimates, keyframe events, per-frame ATE profile.
Run with JAX_PLATFORMS=cpu (like the tests' conftest).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", None)

import numpy as np

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.tracking.windowed import WindowedRunner
from snakeslam_tpu.utils.imu_synthetic import orbit_pose_wb, synth_imu
from snakeslam_tpu.utils.synthetic import SyntheticWorld


def main():
    n_frames = 120
    fps = 10.0
    bg_true = np.array([0.01, -0.008, 0.012])
    settings = Settings()
    settings.input_type = InputType.Mono
    settings.enable_imu = True
    if os.environ.get("DBG_NO_EXPLORE"):
        settings.fine_explore = False
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

    sol = system.imu_solver
    smap = system.map

    # ---- instrument the VI state machine ----
    orig_update = sol.update_map
    events = []

    def traced_update():
        st0 = sol.stage
        g0 = sol.gravity_initialized
        orig_update()
        kfs = smap.valid_keyframes()
        if sol.stage != st0 or sol.gravity_initialized != g0:
            events.append(
                f"[VI] stage {st0.name} -> {sol.stage.name}"
                f" n_kf={len(kfs)} bg={np.round(sol.bg, 4)}"
                f" scale={sol.init_scale:.4f}")
            print(events[-1], flush=True)
    sol.update_map = traced_update

    orig_erase = smap.erase_keyframe

    def traced_erase(kf):
        print(f"[cull] kf={kf} frame={smap.kf_frame_id[kf]}", flush=True)
        return orig_erase(kf)
    smap.erase_keyframe = traced_erase

    runner = WindowedRunner(system, window=8, two_stage=True)
    runner.run(frames)

    print(f"gyro_init={sol.gyro_initialized} bg={np.round(sol.bg, 5)} "
          f"(true {bg_true})")
    print(f"gravity_init={sol.gravity_initialized} "
          f"init_scale={sol.init_scale:.4f} refine_idx={sol.refine_idx} "
          f"stage={sol.stage.name}")
    rmse, scale, n = system.ate_against_gt(with_scale=True)
    print(f"Sim3 ATE={rmse:.4f} scale={scale:.4f} n={n}")
    rmse_se3, _, _ = system.ate_against_gt(with_scale=False)
    print(f"SE3  ATE={rmse_se3:.4f}")
    print(f"keyframes={smap.n_keyframes} points={smap.n_points} "
          f"tracked={len(system.tracker.trajectory)} "
          f"device_calls={runner.n_device_calls}")

    # per-frame error profile after Sim3 alignment
    from snakeslam_tpu.core.trajectory import umeyama

    est, gt, ids = [], [], []
    for f in system.tracker.trajectory:
        if f.pose_cw is None or f.gt_pose_cw is None:
            continue
        est.append(np.linalg.inv(f.pose_cw)[:3, 3])
        gt.append(np.linalg.inv(f.gt_pose_cw)[:3, 3])
        ids.append(f.frame_id)
    est, gt = np.asarray(est), np.asarray(gt)
    s, R, t = umeyama(est, gt, with_scale=True)
    err = np.linalg.norm((s * (R @ est.T)).T + t - gt, axis=1)
    print("err profile (frame: err_m):")
    for a in range(0, len(err), max(len(err) // 24, 1)):
        print(f"  f{ids[a]:4d}: {err[a]:.4f}")
    print(f"max err {err.max():.4f} at frame {ids[int(err.argmax())]}")


if __name__ == "__main__":
    main()
