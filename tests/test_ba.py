import numpy as np
import jax.numpy as jnp

from snakeslam_tpu.core import lie
from snakeslam_tpu.core.camera import Pinhole
from snakeslam_tpu.ops import ba as BA

CAM = Pinhole.create(458.654, 457.296, 367.215, 248.375, dtype=jnp.float64)
BF = jnp.float64(458.654 * 0.11)
F64 = jnp.float64


def _make_ba_problem(rng, C=8, P=200, M=8, noise_px=0.3, pose_noise=0.01,
                     point_noise=0.05, n_fixed=2, stereo=False,
                     outlier_frac=0.0):
    # cameras on an arc looking at a point cloud
    pts = rng.uniform(-4, 4, size=(P, 3))
    pts[:, 2] += 14.0
    cams_true = []
    for c in range(C):
        xi = np.array([0.4 * c, 0.02 * c, 0.0, 0.0, 0.04 * c, 0.0])
        cams_true.append(np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=F64))))
    cams_true = np.stack(cams_true)

    obs_cam = np.full((P, M), -1, dtype=np.int32)
    obs_uv = np.zeros((P, M, 2))
    obs_right = np.full((P, M), -1.0)
    obs_w = np.ones((P, M))
    obs_valid = np.zeros((P, M), dtype=bool)
    outlier_gt = np.zeros((P, M), dtype=bool)
    for p in range(P):
        cs = rng.choice(C, size=min(M, C), replace=False)
        for k, c in enumerate(cs):
            T = cams_true[c]
            pc = T[:3, :3] @ pts[p] + T[:3, 3]
            if pc[2] < 0.5:
                continue
            u = 458.654 * pc[0] / pc[2] + 367.215
            v = 457.296 * pc[1] / pc[2] + 248.375
            u += rng.normal(scale=noise_px)
            v += rng.normal(scale=noise_px)
            if outlier_frac > 0 and rng.random() < outlier_frac:
                u += rng.uniform(10, 40) * np.sign(rng.normal())
                outlier_gt[p, k] = True
            obs_cam[p, k] = c
            obs_uv[p, k] = (u, v)
            if stereo:
                obs_right[p, k] = u - float(BF) / pc[2] + rng.normal(scale=noise_px)
            obs_valid[p, k] = True

    cam_noisy = cams_true.copy()
    for c in range(n_fixed, C):
        xi = rng.normal(size=6) * pose_noise
        cam_noisy[c] = np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=F64))) @ cams_true[c]
    pts_noisy = pts + rng.normal(scale=point_noise, size=pts.shape)

    fixed = np.zeros(C, dtype=bool)
    fixed[:n_fixed] = True
    problem = BA.BAProblem(
        cam_pose=jnp.asarray(cam_noisy, dtype=F64),
        cam_fixed=jnp.asarray(fixed),
        cam_valid=jnp.ones(C, dtype=bool),
        points=jnp.asarray(pts_noisy, dtype=F64),
        point_valid=jnp.ones(P, dtype=bool),
        obs_cam=jnp.asarray(obs_cam),
        obs_uv=jnp.asarray(obs_uv, dtype=F64),
        obs_right=jnp.asarray(obs_right, dtype=F64),
        obs_weight=jnp.asarray(obs_w, dtype=F64),
        obs_valid=jnp.asarray(obs_valid),
        **{k: (v.astype(F64) if v.dtype.kind == "f" else v)
           for k, v in BA.empty_rpc(dtype=F64).items()},
    )
    return problem, cams_true, pts, outlier_gt


def _cam_errs(cam_est, cams_true):
    errs = []
    for c in range(len(cams_true)):
        d = np.asarray(
            lie.se3_log(
                jnp.asarray(cam_est[c], dtype=F64)
                @ jnp.linalg.inv(jnp.asarray(cams_true[c], dtype=F64))
            )
        )
        errs.append(np.abs(d).max())
    return np.array(errs)


def test_ba_converges_mono(rng):
    problem, cams_true, pts_true, _ = _make_ba_problem(rng, noise_px=0.0)
    cam_est, pts_est, cost = BA.solve_ba(problem, CAM, BF, iterations=6)
    cam_est = np.asarray(cam_est)
    errs = _cam_errs(cam_est, cams_true)
    assert errs.max() < 1e-4
    assert np.abs(np.asarray(pts_est) - pts_true).max() < 1e-3
    assert float(cost) < 1e-6


def test_ba_converges_noisy_stereo(rng):
    problem, cams_true, pts_true, _ = _make_ba_problem(
        rng, noise_px=0.3, stereo=True
    )
    cost0 = BA.ba_cost(problem, CAM, BF, problem.cam_pose, problem.points,
                       2.1, 2.3)
    cam_est, pts_est, cost = BA.solve_ba(problem, CAM, BF, iterations=6)
    assert float(cost) < 0.1 * float(cost0)
    # solution should reach the statistical optimum: cost/dof ~ noise^2
    n_rows = 3 * int(np.asarray(problem.obs_valid).sum())
    assert float(cost) < 1.3 * n_rows * 0.3**2
    errs = _cam_errs(np.asarray(cam_est), cams_true)
    assert errs.max() < 2e-2  # gauge-leverage variance, not solver error


def test_ba_outlier_classification(rng):
    problem, cams_true, pts_true, outlier_gt = _make_ba_problem(
        rng, noise_px=0.2, outlier_frac=0.1
    )
    cam_est, pts_est, _ = BA.solve_ba(problem, CAM, BF, iterations=8)
    out = np.asarray(
        BA.classify_outliers(problem, CAM, BF, cam_est, pts_est)
    )
    # most injected outliers detected; few false positives
    assert out[outlier_gt].mean() > 0.9
    valid = np.asarray(problem.obs_valid)
    clean = valid & ~outlier_gt
    assert out[clean].mean() < 0.02


def test_point_only_ba(rng):
    problem, cams_true, pts_true, _ = _make_ba_problem(
        rng, pose_noise=0.0, point_noise=0.1, noise_px=0.0, n_fixed=8
    )
    pts_est = np.asarray(BA.solve_point_only(problem, CAM, BF, iterations=6))
    assert np.abs(pts_est - pts_true).max() < 1e-4


def test_rpc_only_chain(rng):
    # cameras with no visual observations, tied by exact relative-pose
    # constraints -> chain must snap to ground truth (first cam fixed)
    C = 6
    cams_true = []
    for c in range(C):
        xi = np.array([0.3 * c, 0.01 * c, 0.0, 0.0, 0.05 * c, 0.01 * c])
        cams_true.append(np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=F64))))
    cams_true = np.stack(cams_true)
    cam_noisy = cams_true.copy()
    for c in range(1, C):
        xi = rng.normal(size=6) * 0.02
        cam_noisy[c] = np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=F64))) @ cams_true[c]

    R = C - 1
    rpc_T = np.stack([
        cams_true[i + 1] @ np.linalg.inv(cams_true[i]) for i in range(R)
    ])
    P, M = 4, 2
    fixed = np.zeros(C, dtype=bool)
    fixed[0] = True
    problem = BA.BAProblem(
        cam_pose=jnp.asarray(cam_noisy, dtype=F64),
        cam_fixed=jnp.asarray(fixed),
        cam_valid=jnp.ones(C, dtype=bool),
        points=jnp.zeros((P, 3), dtype=F64),
        point_valid=jnp.zeros(P, dtype=bool),
        obs_cam=jnp.full((P, M), -1, dtype=jnp.int32),
        obs_uv=jnp.zeros((P, M, 2), dtype=F64),
        obs_right=jnp.full((P, M), -1.0, dtype=F64),
        obs_weight=jnp.ones((P, M), dtype=F64),
        obs_valid=jnp.zeros((P, M), dtype=bool),
        rpc_i=jnp.arange(R, dtype=jnp.int32),
        rpc_j=jnp.arange(1, R + 1, dtype=jnp.int32),
        rpc_T=jnp.asarray(rpc_T, dtype=F64),
        rpc_weight=jnp.full((R, 6), 100.0, dtype=F64),
        rpc_valid=jnp.ones(R, dtype=bool),
    )
    cam_est, _, cost = BA.solve_ba(problem, CAM, BF, iterations=10,
                                   optimize_points=False)
    errs = _cam_errs(np.asarray(cam_est), cams_true)
    assert errs.max() < 1e-5
