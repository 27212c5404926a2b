"""Catch the back-end pass that corrupts late keyframe poses in the
windowed mono-VI scenario: wrap every pose-writing back-end entry point
with a before/after snapshot of kf poses and report jumps > 0.5."""
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

# ---- instrument: wrap pose-writing passes ----
m = system.map
IN_TRANSFORM = [False]


def _centers():
    v = np.nonzero(m.kf_valid)[0]
    c = np.stack([np.linalg.inv(m.kf_pose[k])[:3, 3] for k in v]) \
        if len(v) else np.zeros((0, 3))
    return v, c


def wrap(obj, name, label):
    orig = getattr(obj, name)

    def inner(*a, **kw):
        v0, c0 = _centers()
        out = orig(*a, **kw)
        if IN_TRANSFORM[0]:
            return out
        v1, c1 = _centers()
        common = np.intersect1d(v0, v1)
        if len(common):
            i0 = np.searchsorted(v0, common)
            i1 = np.searchsorted(v1, common)
            d = np.linalg.norm(c1[i1] - c0[i0], axis=1)
            big = d > 0.5
            if big.any():
                ks = common[big]
                print(f"[JUMP] {label}: kf {ks.tolist()} "
                      f"(fids {m.kf_frame_id[ks].tolist()}) "
                      f"moved {np.round(d[big], 2).tolist()}", flush=True)
        return out

    setattr(obj, name, inner)


# map.transform is a legit global similarity — mark and skip its window
orig_transform = m.transform


def transform_wrapped(*a, **kw):
    IN_TRANSFORM[0] = True
    try:
        print(f"[TRANSFORM] s={a[0] if a else kw.get('s')}", flush=True)
        return orig_transform(*a, **kw)
    finally:
        IN_TRANSFORM[0] = False


m.transform = transform_wrapped

wrap(system.local_mapper, "insert_keyframe", "insert_keyframe")
wrap(system.local_mapper, "process_sync", "local_mapping.process_sync")
wrap(system.local_mapper, "commit_deferred", "local_mapping.commit_deferred")
wrap(system.lba, "commit", "lba.commit") if hasattr(system, "lba") else None
for attr in ("lba", "local_ba"):
    if hasattr(system, attr):
        wrap(getattr(system, attr), "commit", f"{attr}.commit")
if hasattr(system.local_mapper, "lba"):
    wrap(system.local_mapper.lba, "commit", "lba.commit")
wrap(system.imu_solver, "update_map", "imu.update_map")
wrap(system.imu_solver, "_solve_chain", "imu._solve_chain")
if system.loop_closing is not None:
    wrap(system.loop_closing, "process", "loop.process")
wrap(system, "finalize", "finalize")
simp = getattr(system, "_simp_queue", None)
if simp is not None and hasattr(simp, "force_clean"):
    wrap(simp, "force_clean", "simp.force_clean")

# simplification/deferred objects live where?
for nm in dir(system):
    o = getattr(system, nm)
    if o.__class__.__name__ == "Simplification":
        wrap(o, "process", f"{nm}.process")

runner = WindowedRunner(system, window=8, two_stage=True)
runner.run(frames)
print("done; kf fids:", m.kf_frame_id[np.nonzero(m.kf_valid)[0]].tolist())
