"""Fused Pallas pose-GN kernel vs the XLA robust_pose_refine oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from snakeslam_tpu.core.camera import Pinhole
from snakeslam_tpu.ops.pose_solver import PoseObs, robust_pose_refine


def _problem(seed=0, N=1024, n_outliers=60, stereo=True):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(N, 3)) * np.array([4, 3, 5]) + [0, 0, 12]
    cam = Pinhole(fx=jnp.float32(450.0), fy=jnp.float32(451.0),
                  cx=jnp.float32(370.0), cy=jnp.float32(240.0))
    bf = jnp.float32(48.0)
    # ground-truth pose: small rotation + translation
    from snakeslam_tpu.core import lie
    xi = jnp.asarray(rng.normal(size=6) * [0.1, 0.1, 0.1, 0.02, 0.02, 0.02],
                     dtype=jnp.float32)
    T_gt = np.asarray(lie.se3_exp(xi))
    pc = pts @ T_gt[:3, :3].T + T_gt[:3, 3]
    u = 450.0 * pc[:, 0] / pc[:, 2] + 370.0
    v = 451.0 * pc[:, 1] / pc[:, 2] + 240.0
    uv = np.stack([u, v], 1) + rng.normal(size=(N, 2)) * 0.3
    right = (u - 48.0 / pc[:, 2]) + rng.normal(size=N) * 0.3
    if not stereo:
        right = np.full(N, -1.0)
    else:
        right[rng.choice(N, N // 3, replace=False)] = -1.0
    out_idx = rng.choice(N, n_outliers, replace=False)
    uv[out_idx] += rng.normal(size=(n_outliers, 2)) * 40.0
    mask = np.ones(N, dtype=bool)
    mask[rng.choice(N, 40, replace=False)] = False
    obs = PoseObs(
        points=jnp.asarray(pts, dtype=jnp.float32),
        uv=jnp.asarray(uv, dtype=jnp.float32),
        right=jnp.asarray(right, dtype=jnp.float32),
        weight=jnp.asarray(rng.uniform(0.5, 1.0, N), dtype=jnp.float32),
        mask=jnp.asarray(mask),
    )
    # perturbed initial pose
    dxi = jnp.asarray(rng.normal(size=6) * [0.02, 0.02, 0.02, 5e-3, 5e-3, 5e-3],
                      dtype=jnp.float32)
    T0 = jnp.asarray(np.asarray(lie.se3_exp(dxi)) @ T_gt, dtype=jnp.float32)
    return T0, obs, cam, bf, T_gt


@pytest.mark.parametrize("stereo", [True, False])
def test_fused_matches_xla(stereo):
    from snakeslam_tpu.ops.pose_pallas import pose_refine_fused

    T0, obs, cam, bf, T_gt = _problem(seed=3, stereo=stereo)
    T_ref, inl_ref, n_ref = robust_pose_refine(
        T0, obs, cam, bf, outer_iters=2, inner_iters=2)
    T_f, inl_f, n_f = pose_refine_fused(
        T0, obs.points, obs.uv, obs.right, obs.weight, obs.mask,
        cam, bf, outer_iters=2, inner_iters=2)
    T_ref, T_f = np.asarray(T_ref), np.asarray(T_f)
    # both must land on the ground-truth pose
    for T in (T_ref, T_f):
        err_t = np.linalg.norm(T[:3, 3] - T_gt[:3, 3])
        assert err_t < 2e-3, f"translation error {err_t}"
    # and agree with each other (different orthonormalization, same GN)
    assert np.allclose(T_f, T_ref, atol=2e-4), \
        f"max diff {np.abs(T_f - T_ref).max()}"
    n_ref, n_f = int(n_ref), int(n_f)
    assert abs(n_ref - n_f) <= max(3, n_ref // 100), (n_ref, n_f)
    agree = (np.asarray(inl_ref) == np.asarray(inl_f)).mean()
    assert agree > 0.99, f"inlier agreement {agree}"


def test_fused_small_slot_count():
    from snakeslam_tpu.ops.pose_pallas import pose_refine_fused

    T0, obs, cam, bf, T_gt = _problem(seed=9, N=512)
    T_f, _, n = pose_refine_fused(
        T0, obs.points, obs.uv, obs.right, obs.weight, obs.mask,
        cam, bf, outer_iters=2, inner_iters=2)
    err_t = np.linalg.norm(np.asarray(T_f)[:3, 3] - T_gt[:3, 3])
    assert err_t < 2e-3
    assert int(n) > 300
