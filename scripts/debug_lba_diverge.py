"""Capture the diverging LBA problem in the windowed mono-VI scenario and
diagnose: costs before/after, obs counts, rpc factors, per-camera motion."""
import numpy as np
import jax.numpy as jnp

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings, synthetic_frames)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.tracking.windowed import WindowedRunner
from snakeslam_tpu.utils.imu_synthetic import orbit_pose_wb, synth_imu
from snakeslam_tpu.utils.synthetic import SyntheticWorld
from snakeslam_tpu.ops import ba as BA

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

lba = system.lba
orig_dispatch = lba.dispatch
LAST = {}


def dispatch(kf, iterations=3):
    out = orig_dispatch(kf, iterations)
    if out is not None:
        # re-pack a pristine copy of the problem for post-mortem
        with system.map.lock:
            window, boundary, pts = lba.select_window(kf)
            if len(window) >= 2 and len(pts) >= 20:
                problem, aux = lba.pack(window, boundary, pts)
                LAST["snap"] = (kf, problem, aux, list(window), list(boundary))
    return out


lba.dispatch = dispatch
orig_commit = lba.commit


def commit(kf, fetched, aux, check_state=True):
    before = {k: np.linalg.inv(system.map.kf_pose[k])[:3, 3]
              for k in aux["cams"][: aux["n_window"]]}
    orig_commit(kf, fetched, aux, check_state)
    moved = {}
    for k, c0 in before.items():
        if system.map.kf_valid[k]:
            d = np.linalg.norm(np.linalg.inv(system.map.kf_pose[k])[:3, 3] - c0)
            if d > 2.0:
                moved[k] = d
    if moved and "snap" in LAST and LAST.get("done") is None:
        LAST["done"] = True
        skf, problem, saux, window, boundary = LAST["snap"]
        print(f"\n[DIVERGE] at kf {kf} (snap kf {skf}) moved={moved}")
        print("window", window, "fids", system.map.kf_frame_id[window].tolist())
        print("boundary", boundary)
        print("n_pts", len(saux["pts"]),
              "n_obs_valid", int(np.asarray(saux["obs_valid"]).sum()))
        cam_pose, points, cost = BA.solve_ba(
            problem, lba.cam, lba.bf, iterations=3)
        hd = jnp.float32(np.sqrt(5.991)), jnp.float32(np.sqrt(7.815))
        cost0 = BA.ba_cost(problem, lba.cam, lba.bf,
                           problem.cam_pose, problem.points, *hd)
        cost1 = BA.ba_cost(problem, lba.cam, lba.bf, cam_pose, points, *hd)
        print("cost init", np.asarray(cost0), "-> final", np.asarray(cost1),
              "(solver cost", np.asarray(cost), ")")
        cp = np.asarray(cam_pose)
        for i, k in enumerate(window):
            c0 = np.linalg.inv(np.asarray(problem.cam_pose)[i])[:3, 3]
            c1 = np.linalg.inv(cp[i])[:3, 3]
            print(f"  cam {k} fid {system.map.kf_frame_id[k]} "
                  f"moved {np.linalg.norm(c1 - c0):.2f}")
        rv = np.asarray(problem.rpc_valid)
        print("rpc factors:", int(rv.sum()),
              "weights", np.asarray(problem.rpc_weight)[rv][:, 3:6].max(axis=1) if rv.any() else None)
        # re-solve WITHOUT rpc factors
        prob2 = problem._replace(rpc_valid=jnp.zeros_like(problem.rpc_valid))
        cam2, pts2, cost2 = BA.solve_ba(prob2, lba.cam, lba.bf, iterations=3)
        cp2 = np.asarray(cam2)
        mx = max(np.linalg.norm(np.linalg.inv(cp2[i])[:3, 3]
                                - np.linalg.inv(np.asarray(problem.cam_pose)[i])[:3, 3])
                 for i in range(len(window)))
        print("no-rpc max cam move:", round(float(mx), 3),
              "cost", np.asarray(cost2))
        np.savez("/tmp/diverge_problem.npz",
                 **{f: np.asarray(getattr(problem, f))
                    for f in problem._fields})
        print("saved /tmp/diverge_problem.npz")


lba.commit = commit
runner = WindowedRunner(system, window=8, two_stage=True)
runner.run(frames)
print("done")
