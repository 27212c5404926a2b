"""Check: are keyframe observations already garbage AT INSERTION TIME in
the windowed mono-VI scenario?  Prints per-KF reprojection stats of
frame.matches at the moment of insert."""
import numpy as np

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings, synthetic_frames)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.tracking.windowed import WindowedRunner
from snakeslam_tpu.utils.imu_synthetic import orbit_pose_wb, synth_imu
from snakeslam_tpu.utils.synthetic import SyntheticWorld

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

lm = system.local_mapper
orig = lm._associate_observations
fx, fy, cx, cy = settings.fx, settings.fy, settings.cx, settings.cy


def assoc(kf, frame):
    idx = np.nonzero(frame.matches >= 0)[0]
    if len(idx):
        pts = frame.matches[idx].astype(np.int64)
        live = system.map.pt_valid[pts]
        X = system.map.pt_pos[pts[live]]
        T = frame.pose_cw
        Xc = (T[:3, :3] @ X.T).T + T[:3, 3]
        z = np.maximum(Xc[:, 2], 1e-6)
        u = fx * Xc[:, 0] / z + cx
        v = fy * Xc[:, 1] / z + cy
        uv = np.asarray(frame.uv)[idx[live]][:, :2]
        err = np.hypot(u - uv[:, 0], v - uv[:, 1])
        print(f"[INSERT] kf {kf} fid {frame.frame_id}: n {len(idx)} "
              f"live {int(live.sum())} med {np.median(err):7.2f} "
              f"p90 {np.percentile(err, 90):8.2f} "
              f"frac>5px {float((err > 5).mean()):.2f}", flush=True)
    return orig(kf, frame)


lm._associate_observations = assoc
runner = WindowedRunner(system, window=8, two_stage=True)
runner.run(frames)
print("done")
