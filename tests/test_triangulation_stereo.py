"""Stereo-parallax arbitration + stereo chi2 in pair triangulation.

Covers Triangulator.cpp:199-263: per-endpoint comparison of the pair's ray
parallax against the stereo measurement's own parallax angle, depth
unprojection when the stereo measurement is better, and the 3-dof
projectStereo chi2 gate for stereo-visible matches.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from snakeslam_tpu.core.camera import Pinhole
from snakeslam_tpu.core.pyramid import ScalePyramid
from snakeslam_tpu.ops.matching import FrameFeatures
from snakeslam_tpu.ops.triangulate_pairs import (
    stereo_depth_parallax,
    triangulate_pair,
)

FX = FY = 400.0
CX, CY = 376.0, 240.0
BF = 40.0   # baseline 0.1 m


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _project(T, X):
    p = T[:3, :3] @ X + T[:3, 3]
    return np.array([FX * p[0] / p[2] + CX, FY * p[1] / p[2] + CY]), p[2]


def _features(uv, desc_bits, right=None):
    n = len(uv)
    return FrameFeatures(
        uv=jnp.asarray(uv, dtype=jnp.float32),
        right=jnp.asarray(right if right is not None
                          else np.full(n, -1.0), dtype=jnp.float32),
        octave=jnp.zeros(n, dtype=jnp.int32),
        angle=jnp.zeros(n, dtype=jnp.float32),
        desc_bits=jnp.asarray(desc_bits, dtype=jnp.int8),
        valid=jnp.ones(n, dtype=bool),
    )


def _setup(rng, pts_w, baseline_kf, depth_noise=0.0):
    """Two keyframes separated by baseline_kf along x, both with stereo
    right points derived from (optionally perturbed) true depths."""
    cam = Pinhole.create(FX, FY, CX, CY)
    pyr = ScalePyramid.create(4, 1.2)
    T_a = np.eye(4, dtype=np.float32)
    T_b = np.eye(4, dtype=np.float32)
    T_b[0, 3] = -baseline_kf

    n = len(pts_w)
    desc = rng.integers(0, 2, size=(n, 256)).astype(np.int8)
    uv_a = np.zeros((n, 2))
    uv_b = np.zeros((n, 2))
    right_a = np.zeros(n)
    right_b = np.zeros(n)
    for i, X in enumerate(pts_w):
        uv_a[i], za = _project(T_a, X)
        uv_b[i], zb = _project(T_b, X)
        right_a[i] = uv_a[i, 0] - BF / (za + depth_noise)
        right_b[i] = uv_b[i, 0] - BF / (zb + depth_noise)
    feats_a = _features(uv_a, desc, right_a)
    feats_b = _features(uv_b, desc, right_b)
    free = jnp.ones(n, dtype=bool)
    kw = dict(
        feats_a=feats_a, feats_b=feats_b, free_a=free, free_b=free,
        T_a=jnp.asarray(T_a), T_b=jnp.asarray(T_b), cam=cam,
        bf=jnp.float32(BF), scales=jnp.asarray(pyr.scales),
        inv_sigma2=jnp.asarray(1.0 / pyr.sigma2),
    )
    return kw, T_a, T_b


def test_low_parallax_close_stereo_unprojects_from_depth(rng):
    """Tiny keyframe baseline (2 mm) on close points: ray parallax is far
    worse than the stereo measurement's own parallax, so points must come
    from depth unprojection — matching the numpy oracle exactly, where DLT
    at this geometry would be wildly noisy."""
    pts_w = np.array([[0.3, 0.1, 2.0], [-0.4, -0.2, 2.5], [0.1, 0.3, 3.0]])
    kw, T_a, T_b = _setup(rng, pts_w, baseline_kf=0.002)

    # sanity: the arbitration inputs behave as the reference intends
    cos_stereo = stereo_depth_parallax(BF, FX, 2.0)
    assert cos_stereo < 0.9998  # stereo angle is substantial at 2 m

    out = triangulate_pair(**kw)
    valid = np.asarray(out["valid"])
    assert valid.all()

    # numpy oracle: unproject endpoint a's stereo depth
    uv_a = np.asarray(kw["feats_a"].uv, dtype=np.float64)
    right_a = np.asarray(kw["feats_a"].right, dtype=np.float64)
    z = BF / (uv_a[:, 0] - right_a)
    xn = np.stack([(uv_a[:, 0] - CX) / FX * z, (uv_a[:, 1] - CY) / FY * z,
                   z], axis=1)
    Tinv = np.linalg.inv(T_a)
    oracle = xn @ Tinv[:3, :3].T + Tinv[:3, 3]
    err = np.abs(np.asarray(out["point"]) - oracle)
    assert err.max() < 1e-3, err.max()
    # and the oracle equals the true points (consistent depths)
    assert np.abs(oracle - pts_w).max() < 1e-3


def test_high_parallax_pair_uses_dlt(rng):
    """Wide keyframe baseline on far points: ray parallax beats the stereo
    angle, so DLT runs — the result matches the true geometry even though
    the stereo depths were perturbed (DLT ignores them)."""
    pts_w = np.array([[0.3, 0.1, 20.0], [-0.6, -0.2, 25.0]])
    # perturbed stereo depths: if unprojection were used, points would be
    # ~1 m off; DLT from the two views recovers the truth
    kw, _, _ = _setup(rng, pts_w, baseline_kf=4.0, depth_noise=1.0)
    out = triangulate_pair(**kw)
    valid = np.asarray(out["valid"])
    assert valid.all()
    err = np.abs(np.asarray(out["point"]) - pts_w)
    assert err.max() < 0.05, err.max()


def test_stereo_chi2_rejects_inconsistent_right_point(rng):
    """A match whose mono reprojection is perfect but whose measured right
    coordinate contradicts the triangulated depth fails the 3-dof
    projectStereo gate (it would pass a mono-only chi2)."""
    pts_w = np.array([[0.3, 0.1, 20.0], [-0.6, -0.2, 25.0]])
    kw, _, _ = _setup(rng, pts_w, baseline_kf=4.0)
    out_clean = triangulate_pair(**kw)
    assert np.asarray(out_clean["valid"]).all()

    # corrupt point 0's right coordinate in image a by 12 px
    right = np.asarray(kw["feats_a"].right).copy()
    right[0] -= 12.0
    feats_bad = kw["feats_a"]._replace(right=jnp.asarray(right))
    out = triangulate_pair(**{**kw, "feats_a": feats_bad})
    valid = np.asarray(out["valid"])
    assert not valid[0]      # killed by the stereo residual row
    assert valid[1]


def test_far_away_flag(rng):
    """Depth-unprojected points beyond th_depth carry the far_away flag
    (Triangulator.cpp far_away = depth > th_depth)."""
    pts_w = np.array([[0.3, 0.1, 2.0], [0.2, -0.3, 30.0]])
    kw, _, _ = _setup(rng, pts_w, baseline_kf=0.002)
    out = triangulate_pair(**kw, th_depth=20.0)
    valid = np.asarray(out["valid"])
    far = np.asarray(out["far_away"])
    assert valid.all()
    assert not far[0]
    assert far[1]
