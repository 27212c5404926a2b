"""Geometry core unit tests against numpy/scipy-free oracles."""

import numpy as np
import jax.numpy as jnp

from snakeslam_tpu.core import lie


def random_rotations(rng, n):
    """Uniform-ish random rotations via QR."""
    A = rng.normal(size=(n, 3, 3))
    Q, R = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[:, :, 0] *= det[:, None]
    return Q


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(64, 3)) * 1.5
    n = np.linalg.norm(w, axis=1, keepdims=True)
    w = np.where(n > 3.0, w * (3.0 / n), w)  # log only unique for |w| < pi
    R = np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float64)))
    # orthonormality
    err = np.abs(R @ np.swapaxes(R, 1, 2) - np.eye(3)).max()
    assert err < 1e-9
    w2 = np.asarray(lie.so3_log(jnp.asarray(R)))
    assert np.abs(w - w2).max() < 1e-6


def test_so3_small_angle(rng):
    w = rng.normal(size=(16, 3)) * 1e-7
    R = np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float64)))
    w2 = np.asarray(lie.so3_log(jnp.asarray(R)))
    assert np.abs(w - w2).max() < 1e-10


def test_so3_near_pi(rng):
    axes = rng.normal(size=(16, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    w = axes * 3.10
    R = np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float64)))
    w2 = np.asarray(lie.so3_log(jnp.asarray(R)))
    assert np.abs(w - w2).max() < 1e-5


def test_quat_roundtrip(rng):
    R = random_rotations(rng, 64)
    q = np.asarray(lie.rotmat_to_quat(jnp.asarray(R)))
    assert np.abs(np.linalg.norm(q, axis=1) - 1).max() < 1e-9
    R2 = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
    assert np.abs(R - R2).max() < 1e-8


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6))
    n = np.linalg.norm(xi[:, 3:], axis=1, keepdims=True)
    xi[:, 3:] = np.where(n > 3.0, xi[:, 3:] * (3.0 / n), xi[:, 3:])
    T = np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=jnp.float64)))
    assert np.abs(T[:, 3] - np.array([0, 0, 0, 1])).max() < 1e-12
    xi2 = np.asarray(lie.se3_log(jnp.asarray(T)))
    assert np.abs(xi - xi2).max() < 1e-6


def test_se3_inverse(rng):
    xi = rng.normal(size=(8, 6))
    T = np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=jnp.float64)))
    Ti = np.asarray(lie.se3_inverse(jnp.asarray(T)))
    eye = T @ Ti
    assert np.abs(eye - np.eye(4)).max() < 1e-9


def test_se3_exp_matches_matrix_exp(rng):
    # oracle: scipy-free matrix exponential via series on the 4x4 tangent
    xi = rng.normal(size=(6,))
    A = np.zeros((4, 4))
    A[:3, :3] = np.asarray(lie.hat(jnp.asarray(xi[3:])))
    A[:3, 3] = xi[:3]
    M = np.eye(4)
    term = np.eye(4)
    for k in range(1, 30):
        term = term @ A / k
        M = M + term
    T = np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=jnp.float64)))
    assert np.abs(T - M).max() < 1e-9


def test_transform_points(rng):
    xi = rng.normal(size=(6,))
    T = np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=jnp.float64)))
    pts = rng.normal(size=(32, 3))
    out = np.asarray(lie.transform_points(jnp.asarray(T), jnp.asarray(pts)))
    oracle = (T[:3, :3] @ pts.T).T + T[:3, 3]
    assert np.abs(out - oracle).max() < 1e-9


def test_sim3(rng):
    R = random_rotations(rng, 4)
    t = rng.normal(size=(4, 3))
    s = np.abs(rng.normal(size=(4,))) + 0.5
    S = np.asarray(lie.sim3(jnp.asarray(s), jnp.asarray(R), jnp.asarray(t)))
    assert np.abs(np.asarray(lie.sim3_scale(jnp.asarray(S))) - s).max() < 1e-9
    Si = np.asarray(lie.sim3_inverse(jnp.asarray(S)))
    assert np.abs(S @ Si - np.eye(4)).max() < 1e-8


def test_qt_storage_roundtrip(rng):
    xi = rng.normal(size=(16, 6))
    T = np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=jnp.float64)))
    qt = np.asarray(lie.se3_to_qt(jnp.asarray(T)))
    T2 = np.asarray(lie.qt_to_se3(jnp.asarray(qt)))
    assert np.abs(T - T2).max() < 1e-8
