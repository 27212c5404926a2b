"""Stereo rectification: rectified correspondences must share image rows."""

import numpy as np
import jax.numpy as jnp

from snakeslam_tpu.core import lie
from snakeslam_tpu.core.camera import Distortion, Pinhole
from snakeslam_tpu.frontend.stereo_rectify import stereo_rectify


def _project(K_cam, T, pts):
    pc = pts @ T[:3, :3].T + T[:3, 3]
    fx = float(np.asarray(K_cam.fx))
    fy = float(np.asarray(K_cam.fy))
    cx = float(np.asarray(K_cam.cx))
    cy = float(np.asarray(K_cam.cy))
    return np.stack([
        fx * pc[:, 0] / pc[:, 2] + cx,
        fy * pc[:, 1] / pc[:, 2] + cy,
    ], axis=1), pc[:, 2]


def test_rectified_rows_align(rng):
    cam_l = Pinhole.create(460.0, 458.0, 370.0, 240.0, dtype=jnp.float64)
    cam_r = Pinhole.create(457.0, 456.0, 372.0, 245.0, dtype=jnp.float64)
    # EuRoC-like rig: 11 cm baseline with a small relative rotation
    w = np.array([0.004, -0.009, 0.002])
    R_rl = np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float64)))
    c_r_in_l = np.array([0.11, 0.001, -0.002])
    t_rl = -R_rl @ c_r_in_l

    rect_l, rect_r, bf = stereo_rectify(cam_l, cam_r, R_rl, t_rl)
    assert abs(bf - float(np.asarray(rect_l.cam_new.fx))
               * np.linalg.norm(c_r_in_l)) < 1e-9

    pts = rng.uniform(-2, 2, size=(200, 3))
    pts[:, 2] = rng.uniform(3, 15, size=200)
    T_l = np.eye(4)
    T_r = np.eye(4)
    T_r[:3, :3] = R_rl
    T_r[:3, 3] = t_rl
    uv_l, z_l = _project(cam_l, T_l, pts)
    uv_r, z_r = _project(cam_r, T_r, pts)

    ruv_l = rect_l.rectify_points(uv_l)
    ruv_r = rect_r.rectify_points(uv_r)
    # epipolar alignment: same row in both rectified images
    dv = np.abs(ruv_l[:, 1] - ruv_r[:, 1])
    assert dv.max() < 0.1, f"row misalignment {dv.max():.4f} px"
    # disparity consistent with depth: disp = bf / z (z in rectified frame)
    disp = ruv_l[:, 0] - ruv_r[:, 0]
    z_rect = (pts @ rect_l.R_rect.T)[:, 2]
    assert np.abs(disp - bf / z_rect).max() < 0.1


def test_rectify_with_distortion(rng):
    cam = Pinhole.create(460.0, 458.0, 370.0, 240.0, dtype=jnp.float64)
    dist = Distortion.create(-0.28, 0.07, 0.0002, 0.00002, dtype=jnp.float64)
    R_rl = np.eye(3)
    t_rl = np.array([-0.11, 0.0, 0.0])
    rect_l, rect_r, bf = stereo_rectify(cam, cam, R_rl, t_rl,
                                        dist_left=dist, dist_right=dist)
    # distorted observation of a known point rectifies to the ideal pinhole
    from snakeslam_tpu.core.camera import distort

    pts = rng.uniform(-1, 1, size=(50, 3))
    pts[:, 2] = rng.uniform(4, 10, size=50)
    xn = pts[:, :2] / pts[:, 2:3]
    xd = np.asarray(distort(jnp.asarray(xn), dist))
    uv_raw = np.stack([
        460.0 * xd[:, 0] + 370.0, 458.0 * xd[:, 1] + 240.0
    ], axis=1)
    ruv = rect_l.rectify_points(uv_raw)
    # rectified rotation is ~identity here, so compare to the pinhole proj
    expected = np.asarray(rect_l.cam_new.project_normalized(jnp.asarray(xn)))
    assert np.abs(ruv - expected).max() < 0.05
