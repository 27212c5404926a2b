"""IMU kernel tests against the synthetic trajectory oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from snakeslam_tpu.core import lie
from snakeslam_tpu.ops import imu as IMU
from snakeslam_tpu.utils.imu_synthetic import (
    G_WORLD,
    orbit_pose_wb,
    synth_imu,
    true_state,
)

F64 = jnp.float64


def _window(data, t0, t1):
    sel = (data["t"] >= t0 - 1e-9) & (data["t"] < t1 - 1e-9)
    return (
        jnp.asarray(data["omega"][sel], dtype=F64),
        jnp.asarray(data["acc"][sel], dtype=F64),
        jnp.asarray(data["dt"][sel], dtype=F64),
        jnp.ones(sel.sum(), dtype=bool),
    )


def test_preintegration_predicts_true_state():
    data = synth_imu(orbit_pose_wb, 0.0, 1.0, rate=400.0)
    om, ac, dt, m = _window(data, 0.0, 1.0)
    p = IMU.preintegrate(om, ac, dt, m, jnp.zeros(3, F64), jnp.zeros(3, F64))
    R0, p0, v0 = true_state(orbit_pose_wb, 0.0)
    R1, p1, v1 = true_state(orbit_pose_wb, 1.0)
    Rj, vj, pj = IMU.predict(
        p, jnp.asarray(R0, F64), jnp.asarray(v0, F64), jnp.asarray(p0, F64),
        jnp.asarray(G_WORLD, F64),
    )
    assert np.abs(np.asarray(Rj) - R1).max() < 1e-3
    assert np.abs(np.asarray(vj) - v1).max() < 5e-3
    assert np.abs(np.asarray(pj) - p1).max() < 5e-3


def test_preintegration_bias_jacobians():
    data = synth_imu(orbit_pose_wb, 0.0, 0.5, rate=400.0)
    om, ac, dt, m = _window(data, 0.0, 0.5)
    z = jnp.zeros(3, F64)
    p0 = IMU.preintegrate(om, ac, dt, m, z, z)
    dbg = jnp.asarray([0.004, -0.003, 0.002], F64)
    dba = jnp.asarray([0.03, 0.02, -0.04], F64)
    p1 = IMU.preintegrate(om, ac, dt, m, dbg, dba)
    dR_c, dv_c, dp_c = IMU.preint_with_bias_correction(p0, dbg, dba)
    # first-order correction should match re-integration closely
    assert np.abs(np.asarray(dR_c) - np.asarray(p1.dR)).max() < 1e-4
    assert np.abs(np.asarray(dv_c) - np.asarray(p1.dv)).max() < 2e-3
    assert np.abs(np.asarray(dp_c) - np.asarray(p1.dp)).max() < 1e-3


def _kf_data(n_kf=12, kf_dt=0.5, bg=None, ba=None, rate=200.0):
    data = synth_imu(orbit_pose_wb, 0.0, n_kf * kf_dt, rate=rate,
                     bg=bg, ba=ba)
    z = jnp.zeros(3, F64)
    preints = []
    states = []
    for k in range(n_kf):
        states.append(true_state(orbit_pose_wb, k * kf_dt))
    for k in range(n_kf - 1):
        om, ac, dt, m = _window(data, k * kf_dt, (k + 1) * kf_dt)
        preints.append(IMU.preintegrate(om, ac, dt, m, z, z))
    R = np.stack([s[0] for s in states])
    p = np.stack([s[1] for s in states])
    v = np.stack([s[2] for s in states])
    return R, p, v, preints


@pytest.mark.slow
def test_gyro_bias_recovery():
    bg_true = np.array([0.02, -0.015, 0.01])
    R, p, v, preints = _kf_data(bg=bg_true)
    bg = jnp.zeros(3, F64)
    # iterate: re-correct preintegration at current bias, solve increment
    for _ in range(4):
        dRs, Js = [], []
        for pr in preints:
            dR_c = pr.dR @ lie.so3_exp(pr.J_R_bg @ bg)
            dRs.append(dR_c)
            Js.append(pr.J_R_bg)
        dbg, rms = IMU.solve_gyro_bias(
            jnp.asarray(R[:-1], F64), jnp.asarray(R[1:], F64),
            jnp.stack(dRs), jnp.stack(Js),
            jnp.ones(len(preints), dtype=bool),
        )
        bg = bg + dbg
    assert np.abs(np.asarray(bg) - bg_true).max() < 2e-3


@pytest.mark.slow
def test_scale_gravity_recovery():
    s_true = 2.7
    R, p, v, preints = _kf_data(n_kf=14)
    p_vis = p / s_true  # visual positions are under-scaled
    dt12 = jnp.asarray([float(pr.dt) for pr in preints[:-1]], F64)
    dt23 = jnp.asarray([float(pr.dt) for pr in preints[1:]], F64)
    dp12 = jnp.stack([pr.dp for pr in preints[:-1]])
    dp23 = jnp.stack([pr.dp for pr in preints[1:]])
    dv12 = jnp.stack([pr.dv for pr in preints[:-1]])
    s, g, ba, rms = IMU.solve_scale_gravity(
        jnp.asarray(R, F64), jnp.asarray(p_vis, F64),
        dt12, dt23, dp12, dp23, dv12,
        jnp.ones(len(preints) - 1, dtype=bool),
    )
    assert abs(float(s) - s_true) / s_true < 0.02
    assert np.abs(np.asarray(g) - G_WORLD).max() < 0.15


@pytest.mark.slow
def test_scale_gravity_with_acc_bias():
    s_true = 1.8
    ba_true = np.array([0.05, -0.03, 0.08])
    R, p, v, preints = _kf_data(n_kf=16, ba=ba_true)
    p_vis = p / s_true
    dt12 = jnp.asarray([float(pr.dt) for pr in preints[:-1]], F64)
    dt23 = jnp.asarray([float(pr.dt) for pr in preints[1:]], F64)
    s, g, ba, rms = IMU.solve_scale_gravity(
        jnp.asarray(R, F64), jnp.asarray(p_vis, F64),
        dt12, dt23,
        jnp.stack([pr.dp for pr in preints[:-1]]),
        jnp.stack([pr.dp for pr in preints[1:]]),
        jnp.stack([pr.dv for pr in preints[:-1]]),
        jnp.ones(len(preints) - 1, dtype=bool),
        Jp12_ba=jnp.stack([pr.J_p_ba for pr in preints[:-1]]),
        Jp23_ba=jnp.stack([pr.J_p_ba for pr in preints[1:]]),
        Jv12_ba=jnp.stack([pr.J_v_ba for pr in preints[:-1]]),
        with_acc_bias=True,
    )
    assert abs(float(s) - s_true) / s_true < 0.05
    assert np.abs(np.asarray(ba) - ba_true).max() < 0.05


@pytest.mark.slow
def test_velocities_from_pairs():
    R, p, v, preints = _kf_data(n_kf=10)
    dt = jnp.asarray([float(pr.dt) for pr in preints], F64)
    dp = jnp.stack([pr.dp for pr in preints])
    vel = IMU.velocities_from_pairs(
        jnp.asarray(R, F64), jnp.asarray(p, F64), dt, dp,
        jnp.ones(len(preints), dtype=bool),
        jnp.float64(1.0), jnp.asarray(G_WORLD, F64),
    )
    assert np.abs(np.asarray(vel)[:-1] - v[:-1]).max() < 0.05


@pytest.mark.slow
def test_imu_chain_solver():
    bg_true = np.array([0.01, -0.008, 0.012])
    ba_true = np.array([0.04, -0.02, 0.05])
    s_true = 2.0
    R, p, v, _ = _kf_data(n_kf=14)
    # re-generate with biases
    data = synth_imu(orbit_pose_wb, 0.0, 14 * 0.5, rate=200.0,
                     bg=bg_true, ba=ba_true)
    z = jnp.zeros(3, F64)
    preints = []
    for k in range(13):
        om, ac, dt, m = _window(data, k * 0.5, (k + 1) * 0.5)
        preints.append(IMU.preintegrate(om, ac, dt, m, z, z))
    chain = IMU.ImuChain(
        R=jnp.asarray(R, F64),
        p=jnp.asarray(p / s_true, F64),
        v=jnp.asarray(v / s_true, F64),  # crude init
        dt=jnp.asarray([float(pr.dt) for pr in preints], F64),
        dR=jnp.stack([pr.dR for pr in preints]),
        dv=jnp.stack([pr.dv for pr in preints]),
        dp=jnp.stack([pr.dp for pr in preints]),
        J_R_bg=jnp.stack([pr.J_R_bg for pr in preints]),
        J_v_bg=jnp.stack([pr.J_v_bg for pr in preints]),
        J_v_ba=jnp.stack([pr.J_v_ba for pr in preints]),
        J_p_bg=jnp.stack([pr.J_p_bg for pr in preints]),
        J_p_ba=jnp.stack([pr.J_p_ba for pr in preints]),
        edge_valid=jnp.ones(len(preints), dtype=bool),
    )
    g0 = jnp.asarray(G_WORLD + np.array([0.3, -0.2, 0.1]), F64)
    out = IMU.solve_imu_chain(
        chain, z, z, g0, jnp.float64(1.2),
        solve_scale=True, iterations=8,
    )
    assert abs(float(out["s"]) - s_true) / s_true < 0.05
    assert np.abs(np.asarray(out["bg"]) - bg_true).max() < 3e-3
    assert np.abs(np.asarray(out["g"]) - G_WORLD).max() < 0.15
    # velocities recovered in *visual* scale: v_state ~ true v (world, metric)
    assert np.abs(np.asarray(out["v"]) - v).max() < 0.2


def test_imu_sequence_merge_on_keyframe_cull():
    """Culling a mid-chain keyframe must splice its IMU sequence into the
    next keyframe's edge (Keyframe::SetBadFlag merge semantics,
    /root/reference/Snake/Map/Keyframe.cpp:456-601) so _chain_keyframes
    still yields one unbroken chain with matching time spans."""
    from snakeslam_tpu.imu.state_solver import ImuStateSolver
    from snakeslam_tpu.map.slam_map import FrameData, SlamMap
    from snakeslam_tpu.system.settings import Settings

    s = Settings()
    s.enable_imu = True
    smap = SlamMap(max_keyframes=16, max_points=64, max_features=8)
    sol = ImuStateSolver(s, smap)

    rate = 100.0
    dt_kf = 0.5
    kfs = []
    rng = np.random.default_rng(0)
    for i in range(4):
        n = 4
        fd = FrameData(
            frame_id=i * 10, timestamp=i * dt_kf,
            uv=np.zeros((n, 2)), octave=np.zeros(n, np.int32),
            angle=np.zeros(n), descriptors=np.zeros((n, 32), np.uint8),
            right=np.full(n, -1.0), depth=np.full(n, -1.0),
        )
        fd.pose_cw = np.eye(4)
        k = smap.allocate_keyframe(fd)
        if kfs:
            smap.kf_prev[k] = kfs[-1]
            smap.kf_next[kfs[-1]] = k
            ns = int(dt_kf * rate)
            fd.imu_omega = rng.normal(0, 0.01, (ns, 3))
            fd.imu_acc = rng.normal(0, 0.01, (ns, 3)) + [0, 0, 9.81]
            fd.imu_dt = np.full(ns, 1.0 / rate)
            fd.imu_t = (i - 1) * dt_kf + np.arange(ns) / rate
            sol.add_frame_samples(fd)
            sol.process_new_keyframe(k, kfs[-1])
        kfs.append(k)

    chain = sol._chain_keyframes()
    assert len(chain) == 3
    # cull the middle keyframe (kfs[1]); its edge must merge into kfs[2]'s
    smap.erase_keyframe(kfs[1])
    chain = sol._chain_keyframes()
    assert len(chain) == 2, f"chain broke after cull: {chain}"
    (i0, j0, e0), (i1, j1, e1) = chain
    assert (i0, j0) == (kfs[0], kfs[2])
    assert (i1, j1) == (kfs[2], kfs[3])
    # the merged edge spans both original intervals
    assert abs(float(e0.preint.dt) - 2 * dt_kf) < 0.02
    assert len(e0.omega) == 2 * int(dt_kf * rate)
    # and the suffix is the whole chain (no truncation)
    assert sol._connected_suffix(chain) == chain


@pytest.mark.slow
def test_scale_gravity_with_lever_arm():
    """Camera-IMU lever arm carried exactly through the triplet equations
    (reference solves in body frame with full camera_to_body extrinsics,
    Snake/IMU/ImuStateSolver.cpp:352-466).  A 5 cm lever on an EuRoC-like
    rotated rig must recover scale within 1%."""
    s_true = 2.2
    # camera<-body: 90 deg rotation + 5 cm offset (EuRoC-like rig)
    R_cb = np.array([[0.0, -1.0, 0.0],
                     [1.0, 0.0, 0.0],
                     [0.0, 0.0, 1.0]])
    t_cb = np.array([0.05, -0.02, 0.01])
    R_wb, p_wb, v, preints = _kf_data(n_kf=14)
    # camera pose from the body trajectory: T_wc = T_wb * T_cb^-1
    R_cam = np.einsum("kij,lj->kil", R_wb, R_cb)      # R_wb @ R_cb^T
    t_bc = -R_cb.T @ t_cb                              # camera origin in body
    p_cam = p_wb + np.einsum("kij,j->ki", R_wb, t_bc)
    p_vis = p_cam / s_true
    dt12 = jnp.asarray([float(pr.dt) for pr in preints[:-1]], F64)
    dt23 = jnp.asarray([float(pr.dt) for pr in preints[1:]], F64)
    dp12 = jnp.stack([pr.dp for pr in preints[:-1]])
    dp23 = jnp.stack([pr.dp for pr in preints[1:]])
    dv12 = jnp.stack([pr.dv for pr in preints[:-1]])
    valid = jnp.ones(len(preints) - 1, dtype=bool)
    # note: the visual estimate scales camera centers, but the lever
    # contribution R_wc t_cb is metric — reconstruct body rotations from
    # the camera rotations as the state solver does (R_wb = R_wc R_cb)
    R_body = np.einsum("kij,jl->kil", R_cam, R_cb)
    s, g, ba, rms = IMU.solve_scale_gravity(
        jnp.asarray(R_body, F64), jnp.asarray(p_vis, F64),
        dt12, dt23, dp12, dp23, dv12, valid,
        R_cam=jnp.asarray(R_cam, F64), t_cb=jnp.asarray(t_cb, F64),
        with_lever=True,
    )
    assert abs(float(s) - s_true) / s_true < 0.01, f"scale {float(s)}"
    assert np.abs(np.asarray(g) - G_WORLD).max() < 0.12
    # the lever-free solve must be measurably worse on the same rig —
    # the term this test guards actually matters
    s0, g0, _, _ = IMU.solve_scale_gravity(
        jnp.asarray(R_body, F64), jnp.asarray(p_vis, F64),
        dt12, dt23, dp12, dp23, dv12, valid,
    )
    assert abs(float(s0) - s_true) > abs(float(s) - s_true)
