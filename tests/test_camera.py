import numpy as np
import jax.numpy as jnp

from snakeslam_tpu.core.camera import (
    Distortion,
    Pinhole,
    StereoCamera,
    distort,
    project,
    project_stereo,
    undistort,
    unproject,
)

# EuRoC cam0 calibration
EUROC = dict(fx=458.654, fy=457.296, cx=367.215, cy=248.375)
EUROC_DIST = dict(k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05)


def test_project_unproject_roundtrip(rng):
    cam = Pinhole.create(**EUROC, dtype=jnp.float64)
    z = rng.uniform(0.5, 10.0, size=(128,))
    uv = rng.uniform([0, 0], [752, 480], size=(128, 2))
    pc = np.asarray(unproject(cam, jnp.asarray(uv), jnp.asarray(z)))
    uv2, z2 = project(cam, jnp.asarray(pc))
    assert np.abs(np.asarray(uv2) - uv).max() < 1e-9
    assert np.abs(np.asarray(z2) - z).max() < 1e-12


def test_distort_undistort_roundtrip(rng):
    d = Distortion.create(**EUROC_DIST, dtype=jnp.float64)
    xn = rng.uniform(-0.6, 0.6, size=(512, 2))
    xd = distort(jnp.asarray(xn), d)
    xn2 = np.asarray(undistort(xd, d, iters=10))
    assert np.abs(xn2 - xn).max() < 1e-8


def test_stereo_projection():
    cam = Pinhole.create(**EUROC, dtype=jnp.float64)
    scam = StereoCamera(cam, jnp.float64(458.654 * 0.11))  # 11cm baseline
    pc = jnp.asarray([[1.0, 0.5, 4.0]])
    uvr, z = project_stereo(scam, pc)
    uvr = np.asarray(uvr)
    assert uvr[0, 2] < uvr[0, 0]  # right cam x is left of left cam x
    disparity = uvr[0, 0] - uvr[0, 2]
    assert np.isclose(disparity, 458.654 * 0.11 / 4.0)


def test_zero_distortion_identity(rng):
    d = Distortion.create()
    xn = rng.uniform(-0.5, 0.5, size=(16, 2)).astype(np.float32)
    out = np.asarray(distort(jnp.asarray(xn), d))
    assert np.abs(out - xn).max() == 0.0
    assert d.is_zero()
