"""Debug harness for test_windowed_mono_vi_tracks: reproduces the scenario
and splits the ATE into stored-pose vs composed-pose, per-frame, to locate
gauge-mixing in the frame trajectory."""
import numpy as np

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings, synthetic_frames)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.tracking.windowed import WindowedRunner
from snakeslam_tpu.utils.imu_synthetic import orbit_pose_wb, synth_imu
from snakeslam_tpu.utils.synthetic import SyntheticWorld
from snakeslam_tpu.core import trajectory as traj_mod

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
    world, traj(n_frames, fps), settings, noise_px=0.3, imu=imu))
import os
if os.environ.get("NO_REFINE") == "1":
    from snakeslam_tpu.imu.state_solver import ImuStateSolver
    system.imu_solver._stage_refine = lambda: None
    print("[refine disabled]")
elif os.environ.get("NO_RMOUT") == "1":
    import snakeslam_tpu.optim.gba as _g
    _g.GlobalBA.remove_outliers = lambda self, factor=0.75: 0
    print("[remove_outliers disabled]")
elif os.environ.get("NO_PTBA") == "1":
    import snakeslam_tpu.optim.gba as _g
    _g.GlobalBA.point_ba = lambda self, iterations=4: None
    print("[point_ba disabled]")
runner = WindowedRunner(system, window=8, two_stage=True)
runner.run(frames)

sol = system.imu_solver
print("gyro_init", sol.gyro_initialized, "bg", sol.bg,
      "grav_init", sol.gravity_initialized, "stage", sol.stage,
      "refine_idx", sol.refine_idx, "init_scale", getattr(sol, "init_scale", None))

# --- three ATE variants ---
est_c, est_s, gt = [], [], []
fallback, walked = [], []
for f in system.tracker.trajectory:
    pc = system.frame_pose_global(f)
    if pc is None or f.gt_pose_cw is None:
        continue
    r = f.ref_kf
    direct = (f.rel_to_ref is not None and 0 <= r < system.map.max_keyframes
              and system.map.kf_valid[r]
              and system.map.kf_frame_id[r] == f.ref_frame_id)
    if f.rel_to_ref is None:
        kind = "none"
    elif direct:
        kind = "direct"
    elif np.allclose(pc, f.pose_cw):
        kind = "fallback"
        fallback.append(f.frame_id)
    else:
        kind = "walk"
        walked.append(f.frame_id)
    est_c.append(np.linalg.inv(pc)[:3, 3])
    est_s.append(np.linalg.inv(f.pose_cw)[:3, 3])
    gt.append(np.linalg.inv(f.gt_pose_cw)[:3, 3])
est_c, est_s, gt = map(np.array, (est_c, est_s, gt))
for name, est in [("composed", est_c), ("stored", est_s)]:
    rmse, scale = traj_mod.ate_rmse(est, gt, with_scale=True)
    rmse_se3, _ = traj_mod.ate_rmse(est, gt, with_scale=False)
    print(f"{name}: sim3 {rmse:.4f} scale {scale:.4f} se3 {rmse_se3:.4f}")
print("fallback frames:", fallback[:40])
print("walk frames:", walked[:40])

# per-frame composed error after sim3 alignment
rmse, scale, R_a, t_a = traj_mod.ate_rmse(est_c, gt, with_scale=True,
                                          return_alignment=True) \
    if "return_alignment" in traj_mod.ate_rmse.__code__.co_varnames else (None,)*4
if rmse is None:
    # manual umeyama
    mu_e, mu_g = est_c.mean(0), gt.mean(0)
    E, G = est_c - mu_e, gt - mu_g
    U, S, Vt = np.linalg.svd(G.T @ E / len(E))
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R_a = U @ D @ Vt
    s_a = np.trace(np.diag(S) @ D) / (E ** 2).mean(0).sum()
    aligned = s_a * (R_a @ est_c.T).T + (mu_g - s_a * R_a @ mu_e)
    err = np.linalg.norm(aligned - gt, axis=1)
    fids = [f.frame_id for f in system.tracker.trajectory
            if system.frame_pose_global(f) is not None and f.gt_pose_cw is not None]
    worst = np.argsort(err)[::-1][:25]
    print("worst composed frames:", [(int(fids[i]), round(float(err[i]), 3))
                                     for i in worst])
    # same for stored
    E2 = est_s - est_s.mean(0)
    U, S, Vt = np.linalg.svd(G.T @ E2 / len(E2))
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R2 = U @ D @ Vt
    s2 = np.trace(np.diag(S) @ D) / (E2 ** 2).mean(0).sum()
    al2 = s2 * (R2 @ est_s.T).T + (mu_g - s2 * R2 @ est_s.mean(0))
    err2 = np.linalg.norm(al2 - gt, axis=1)
    worst2 = np.argsort(err2)[::-1][:25]
    print("worst stored frames:", [(int(fids[i]), round(float(err2[i]), 3))
                                   for i in worst2])

# --- drill into worst frames ---
print("\nn_keyframes", system.map.n_keyframes)
kfv = np.nonzero(system.map.kf_valid)[0]
print("valid kf slots:", kfv.tolist())
print("kf frame ids:", system.map.kf_frame_id[kfv].tolist())
for f in system.tracker.trajectory:
    if f.frame_id in (105, 108, 112, 115, 116, 117, 118, 119, 0, 2, 60):
        pc = system.frame_pose_global(f)
        r, rfid = f.ref_kf, f.ref_frame_id
        direct = (f.rel_to_ref is not None and 0 <= r < system.map.max_keyframes
                  and system.map.kf_valid[r]
                  and system.map.kf_frame_id[r] == rfid)
        d = np.linalg.norm(np.linalg.inv(pc)[:3, 3]
                           - np.linalg.inv(f.pose_cw)[:3, 3])
        reln = None if f.rel_to_ref is None else round(
            float(np.linalg.norm(f.rel_to_ref[:3, 3])), 3)
        print(f"frame {f.frame_id}: ref_kf {r} rfid {rfid} direct {direct} "
              f"rel_t {reln} |composed-stored| {d:.3f}")
