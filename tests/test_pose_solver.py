import numpy as np
import jax
import jax.numpy as jnp

from snakeslam_tpu.core import lie
from snakeslam_tpu.core.camera import Pinhole
from snakeslam_tpu.ops.pose_solver import PoseObs, pnp_ransac, robust_pose_refine

CAM = Pinhole.create(458.654, 457.296, 367.215, 248.375)
BF = jnp.float32(458.654 * 0.11)


def _make_problem(rng, n=300, outlier_frac=0.0, noise=0.3, stereo_frac=0.0,
                  pose_scale=0.1):
    pts = rng.uniform(-5, 5, size=(n, 3))
    pts[:, 2] += 12.0
    xi_true = rng.normal(size=6) * pose_scale
    T_true = np.asarray(lie.se3_exp(jnp.asarray(xi_true, dtype=jnp.float64)))
    pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
    uv = np.stack(
        [458.654 * pc[:, 0] / pc[:, 2] + 367.215,
         457.296 * pc[:, 1] / pc[:, 2] + 248.375],
        axis=1,
    )
    uv += rng.normal(scale=noise, size=uv.shape)
    right = np.full(n, -1.0)
    if stereo_frac > 0:
        sel = rng.random(n) < stereo_frac
        right[sel] = uv[sel, 0] - float(BF) / pc[sel, 2] + rng.normal(
            scale=noise, size=sel.sum()
        )
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] += rng.uniform(15, 80, size=(n_out, 2)) * np.sign(
        rng.normal(size=(n_out, 2))
    )
    obs = PoseObs(
        points=jnp.asarray(pts, dtype=jnp.float32),
        uv=jnp.asarray(uv, dtype=jnp.float32),
        right=jnp.asarray(right, dtype=jnp.float32),
        weight=jnp.ones(n, dtype=jnp.float32),
        mask=jnp.ones(n, dtype=bool),
    )
    outlier_mask = np.zeros(n, dtype=bool)
    outlier_mask[out_idx] = True
    return T_true, obs, outlier_mask


def _pose_err(T_est, T_true):
    d = np.asarray(
        lie.se3_log(jnp.asarray(T_est, dtype=jnp.float64)
                    @ jnp.linalg.inv(jnp.asarray(T_true, dtype=jnp.float64)))
    )
    return np.abs(d).max()


def test_pose_refine_clean(rng):
    T_true, obs, _ = _make_problem(rng, noise=0.0)
    # perturbed init
    T0 = np.asarray(
        lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.02, dtype=jnp.float64))
    ) @ T_true
    T, inl, n = robust_pose_refine(
        jnp.asarray(T0, dtype=jnp.float32), obs, CAM, BF
    )
    assert _pose_err(np.asarray(T), T_true) < 1e-3
    assert int(n) == obs.points.shape[0]


def test_pose_refine_outliers(rng):
    T_true, obs, outliers = _make_problem(rng, outlier_frac=0.3, noise=0.2)
    T0 = np.asarray(
        lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.01, dtype=jnp.float64))
    ) @ T_true
    T, inl, n = robust_pose_refine(
        jnp.asarray(T0, dtype=jnp.float32), obs, CAM, BF
    )
    inl = np.asarray(inl)
    assert _pose_err(np.asarray(T), T_true) < 6e-3
    # outliers must be classified out
    assert inl[outliers].sum() == 0
    assert inl[~outliers].mean() > 0.95


def test_pose_refine_stereo(rng):
    T_true, obs, _ = _make_problem(rng, noise=0.1, stereo_frac=0.6)
    T0 = np.asarray(
        lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.02, dtype=jnp.float64))
    ) @ T_true
    T, inl, n = robust_pose_refine(
        jnp.asarray(T0, dtype=jnp.float32), obs, CAM, BF
    )
    assert _pose_err(np.asarray(T), T_true) < 2e-3


def test_pose_refine_prior_pulls_when_few_obs(rng):
    # with a strong prior and very few observations the solution stays close
    # to the prior
    T_true, obs, _ = _make_problem(rng, n=300, noise=0.2)
    few_mask = np.zeros(300, dtype=bool)
    few_mask[:4] = True
    obs = obs._replace(mask=jnp.asarray(few_mask))
    T_prior = T_true.copy()
    T0 = np.asarray(
        lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.05, dtype=jnp.float64))
    ) @ T_true
    T, _, _ = robust_pose_refine(
        jnp.asarray(T0, dtype=jnp.float32), obs, CAM, BF,
        prior_T=jnp.asarray(T_prior, dtype=jnp.float32),
        prior_weight_rotation=1e4, prior_weight_translation=1e4,
    )
    assert _pose_err(np.asarray(T), T_true) < 5e-3


def test_pnp_ransac(rng):
    T_true, obs, outliers = _make_problem(rng, n=400, outlier_frac=0.35,
                                          noise=0.2, pose_scale=0.3)
    key = jax.random.PRNGKey(0)
    T, inl, n = pnp_ransac(obs.points, obs.uv, obs.mask, CAM, key,
                           n_hypotheses=512)
    # RANSAC result is coarse; polish and check
    T2, _, n2 = robust_pose_refine(T, obs, CAM, BF)
    assert int(n) > 150
    assert _pose_err(np.asarray(T2), T_true) < 5e-3
