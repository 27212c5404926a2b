"""Depth-completion grid + depth-guided triangulation recall.

Covers Triangulator::ComputeDepthMap (reference:
Snake/LocalMapping/Triangulator.cpp:296-373) and the depth-guided
projection tier of the dense pair matcher
(MappingORBMatcher::SearchForTriangulationProject, :168-250).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from snakeslam_tpu.core.camera import Pinhole
from snakeslam_tpu.core.pyramid import ScalePyramid
from snakeslam_tpu.ops.depth_grid import build_depth_grid, grid_shape
from snakeslam_tpu.ops.matching import FrameFeatures
from snakeslam_tpu.ops.triangulate_pairs import triangulate_pair


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_grid_observed_cells_exact(rng):
    W, H = 752, 480
    uv = np.array([[100.0, 100.0], [600.0, 400.0]])
    z = np.array([2.0, 8.0])
    g = build_depth_grid(uv, z, W, H)
    GH, GW = grid_shape(W, H)
    assert g.shape == (GH, GW)
    gy, gx = int(100 / H * GH), int(100 / W * GW)
    assert g[gy, gx] == 2.0
    gy, gx = int(400 / H * GH), int(600 / W * GW)
    assert g[gy, gx] == 8.0


def test_grid_forward_fill_and_smooth(rng):
    """Every cell gets a positive prior once any source exists, and
    smoothing keeps values inside the source range (averaging)."""
    W, H = 752, 480
    uv = rng.uniform((0, 0), (W, H), size=(40, 2))
    z = rng.uniform(2.0, 10.0, size=40)
    g = build_depth_grid(uv, z, W, H)
    # after the two forward fills of the reference, only cells above/left
    # of the first source can stay 0; with 40 spread sources, expect the
    # overwhelming majority filled and positive
    assert (g > 0).mean() > 0.9
    assert g.max() <= z.max() + 1e-5
    g_empty = build_depth_grid(uv[:0], z[:0], W, H)
    assert (g_empty == 0).all()


def _features(uv, desc_bits, octave=None):
    n = len(uv)
    return FrameFeatures(
        uv=jnp.asarray(uv, dtype=jnp.float32),
        right=jnp.full(n, -1.0, dtype=jnp.float32),
        octave=jnp.asarray(octave if octave is not None
                           else np.zeros(n, np.int32)),
        angle=jnp.zeros(n, dtype=jnp.float32),
        desc_bits=jnp.asarray(desc_bits, dtype=jnp.int8),
        valid=jnp.ones(n, dtype=bool),
    )


def test_depth_guided_tier_breaks_epipolar_ambiguity(rng):
    """Repeated texture along one epipolar line: two a-features with the
    SAME descriptor both best-match the same b-feature, so the mutual-best
    check kills the second one.  The depth prior projects each a-feature
    within 20 px of only its TRUE b-candidate, so the guided tier recovers
    the lost match (SearchForTriangulationProject semantics)."""
    cam = Pinhole.create(400.0, 400.0, 376.0, 240.0)
    pyr = ScalePyramid.create(4, 1.2)
    scales = jnp.asarray(pyr.scales)
    inv_sigma2 = jnp.asarray(1.0 / pyr.sigma2)
    W, H = 752, 480

    # camera a at origin; camera b translated along +x (horizontal
    # baseline -> epipolar lines are horizontal image rows)
    T_a = np.eye(4, dtype=np.float32)
    T_b = np.eye(4, dtype=np.float32)
    T_b[0, 3] = -0.5    # world->cam_b shifts x

    def project(T, X):
        p = (T[:3, :3] @ X + T[:3, 3])
        return np.array([400.0 * p[0] / p[2] + 376.0,
                         400.0 * p[1] / p[2] + 240.0])

    # two world points on the SAME row (same Y, Z) with identical
    # descriptors — indistinguishable along the shared epipolar line
    X0 = np.array([0.3, 0.1, 4.0])
    X1 = np.array([1.1, 0.1, 4.0])
    desc = rng.integers(0, 2, size=(1, 256)).astype(np.int8)
    uv_a = np.stack([project(T_a, X0), project(T_a, X1)])
    uv_b = np.stack([project(T_b, X0), project(T_b, X1)])
    assert np.linalg.norm(uv_b[0] - uv_b[1]) > 40.0

    feats_a = _features(uv_a, np.concatenate([desc, desc]))
    feats_b = _features(uv_b, np.concatenate([desc, desc]))
    free = jnp.ones(2, dtype=bool)

    kw = dict(feature_distance=50, epipolar_distance=4.0, error_mono=2.1,
              bounds_wh=(float(W), float(H)))

    out_plain = triangulate_pair(
        feats_a, feats_b, free, free,
        jnp.asarray(T_a), jnp.asarray(T_b), cam, jnp.float32(40.0),
        scales, inv_sigma2, grid_a=None, **kw,
    )
    # tier 1 alone: both a-features best-match b0 (argmin tie), the
    # mutual-best check drops a1
    assert bool(out_plain["valid"][0])
    assert not bool(out_plain["valid"][1])

    # grid carrying the true depths at both a-cells
    grid = build_depth_grid(uv_a, np.array([4.0, 4.0]), W, H)
    out = triangulate_pair(
        feats_a, feats_b, free, free,
        jnp.asarray(T_a), jnp.asarray(T_b), cam, jnp.float32(40.0),
        scales, inv_sigma2, grid_a=jnp.asarray(grid), **kw,
    )
    assert bool(out["valid"][0]) and int(out["match_b"][0]) == 0
    assert bool(out["valid"][1]) and int(out["match_b"][1]) == 1
    err = np.abs(np.asarray(out["point"][1]) - X1)
    assert err.max() < 1e-2
