import numpy as np
import jax
import jax.numpy as jnp

from snakeslam_tpu.core import lie
from snakeslam_tpu.ops import twoview as tv
from snakeslam_tpu.ops.triangulation import (
    parallax_cos,
    triangulate_homogeneous,
)


def _two_view_scene(rng, n=300, planar=False, outlier_frac=0.0, noise=0.0):
    if planar:
        pts = rng.uniform(-4, 4, size=(n, 3))
        pts[:, 2] = 10.0 + 0.3 * pts[:, 0]  # near-planar sheet
    else:
        pts = rng.uniform(-4, 4, size=(n, 3))
        pts[:, 2] = rng.uniform(6, 20, size=n)
    T1 = np.eye(4)
    xi = np.array([0.6, 0.05, 0.1, 0.01, 0.08, 0.02])  # baseline mostly x
    T2 = np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=jnp.float64)))
    xn1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ T2[:3, :3].T + T2[:3, 3]
    xn2 = pc2[:, :2] / pc2[:, 2:3]
    if noise > 0:
        xn1 += rng.normal(scale=noise, size=xn1.shape)
        xn2 += rng.normal(scale=noise, size=xn2.shape)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    xn2[out_idx] += rng.uniform(0.05, 0.3, size=(n_out, 2)) * np.sign(
        rng.normal(size=(n_out, 2))
    )
    outliers = np.zeros(n, dtype=bool)
    outliers[out_idx] = True
    return pts, T1, T2, xn1, xn2, outliers


def test_triangulation_exact(rng):
    pts, T1, T2, xn1, xn2, _ = _two_view_scene(rng)
    X = np.asarray(
        triangulate_homogeneous(
            jnp.broadcast_to(jnp.asarray(T1), (len(pts), 4, 4)),
            jnp.broadcast_to(jnp.asarray(T2), (len(pts), 4, 4)),
            jnp.asarray(xn1),
            jnp.asarray(xn2),
        )
    )
    assert np.abs(X - pts).max() < 1e-6


def test_essential_matrix_constraint(rng):
    pts, T1, T2, xn1, xn2, _ = _two_view_scene(rng)
    # T12 maps cam2 coords into cam1: T12 = T1 @ T2^-1
    T12 = np.asarray(
        lie.se3_inverse(jnp.asarray(T2, dtype=jnp.float64))
    )
    E = np.asarray(tv.essential_matrix(jnp.asarray(T12)))
    h1 = np.concatenate([xn1, np.ones((len(pts), 1))], axis=1)
    h2 = np.concatenate([xn2, np.ones((len(pts), 1))], axis=1)
    resid = np.abs(np.einsum("ni,ij,nj->n", h1, E, h2))
    assert resid.max() < 1e-9
    d2 = np.asarray(
        tv.epipolar_distance_squared(jnp.asarray(E), jnp.asarray(xn1), jnp.asarray(xn2))
    )
    assert d2.max() < 1e-15


def test_essential_ransac_and_pose_recovery(rng):
    pts, T1, T2, xn1, xn2, outliers = _two_view_scene(
        rng, outlier_frac=0.3, noise=5e-4
    )
    key = jax.random.PRNGKey(1)
    E, inl, n = tv.essential_ransac(
        jnp.asarray(xn1, dtype=jnp.float64),
        jnp.asarray(xn2, dtype=jnp.float64),
        jnp.ones(len(pts), dtype=bool),
        key,
        n_hypotheses=512,
        threshold=2e-5,
    )
    inl = np.asarray(inl)
    assert int(n) > 150
    assert inl[outliers].mean() < 0.1

    T2_est, X, good = tv.recover_pose_from_essential(
        E, jnp.asarray(xn1, dtype=jnp.float64), jnp.asarray(xn2, dtype=jnp.float64),
        jnp.asarray(inl)
    )
    T2_est = np.asarray(T2_est)
    # translation is up to scale: compare directions + rotation
    t_est = T2_est[:3, 3] / np.linalg.norm(T2_est[:3, 3])
    t_true = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
    assert np.abs(t_est - t_true).max() < 2e-2  # linear 8-pt; 2-view BA tightens later
    dR = T2_est[:3, :3] @ T2[:3, :3].T
    assert np.abs(dR - np.eye(3)).max() < 2e-2
    # triangulated structure matches up to the same global scale
    X = np.asarray(X)
    good = np.asarray(good)
    s = np.linalg.norm(T2[:3, 3]) / 1.0  # |t_est| = 1
    err = np.abs(X[good] * s - pts[good]) / np.maximum(pts[good][:, 2:3], 1)
    assert np.median(err) < 0.02


def test_homography_ransac_planar_vs_general(rng):
    # planar scene -> high H inlier ratio; general scene -> low
    pts, T1, T2, xn1, xn2, _ = _two_view_scene(rng, planar=True, noise=2e-4)
    key = jax.random.PRNGKey(2)
    _, _, n_planar = tv.homography_ransac(
        jnp.asarray(xn1), jnp.asarray(xn2), jnp.ones(len(pts), dtype=bool), key
    )
    pts2, _, _, xn1g, xn2g, _ = _two_view_scene(rng, planar=False, noise=2e-4)
    _, _, n_general = tv.homography_ransac(
        jnp.asarray(xn1g), jnp.asarray(xn2g), jnp.ones(len(pts2), dtype=bool), key
    )
    assert int(n_planar) > 0.8 * len(pts)
    assert int(n_general) < 0.5 * len(pts2)


def test_parallax_cos(rng):
    pts, T1, T2, xn1, xn2, _ = _two_view_scene(rng)
    pc = np.asarray(
        parallax_cos(jnp.asarray(T1), jnp.asarray(T2), jnp.asarray(pts))
    )
    assert (pc < 1.0).all() and (pc > 0.9).all()  # small baseline, far points


def test_mono_init_first_frame_coverage_gate(rng):
    """A texture-poor first frame (features clustered in one corner) is
    rejected; a well-spread later frame becomes the bootstrap reference
    (selectFirstFrame histogram-density rule, MonoInitializer.cpp:469-514)."""
    from snakeslam_tpu.map.slam_map import FrameData
    from snakeslam_tpu.system.settings import Settings
    from snakeslam_tpu.tracking.mono_init import (
        MonoInitializer,
        feature_histogram_density,
    )

    s = Settings()

    def mk(uv, fid):
        n = len(uv)
        f = FrameData(
            frame_id=fid, timestamp=fid / 20.0, uv=uv,
            octave=np.zeros(n, np.int32), angle=np.zeros(n),
            descriptors=rng.integers(0, 256, (n, 32)).astype(np.uint8),
            right=np.full(n, -1.0), depth=np.full(n, -1.0),
        )
        return f

    # clustered: all features in a 60x60 px corner patch
    uv_poor = rng.uniform(0, 60, size=(300, 2))
    # spread: uniform over the full image
    uv_good = rng.uniform((0, 0), (s.width, s.height), size=(300, 2))

    assert feature_histogram_density(uv_poor, s.width, s.height) < 0.05
    assert feature_histogram_density(uv_good, s.width, s.height) > 0.5

    init = MonoInitializer(s)
    assert init.try_initialize(None, mk(uv_poor, 0)) is False
    assert init.ref_frame is None, "texture-poor frame accepted as reference"
    assert init.try_initialize(None, mk(uv_good, 1)) is False
    assert init.ref_frame is not None, "well-covered frame rejected"
    assert init.ref_frame.frame_id == 1
