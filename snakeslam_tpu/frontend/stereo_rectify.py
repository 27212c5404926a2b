"""Stereo rectification setup — no OpenCV dependency.

Replacement for the reference's StereoTransforms, which wraps
``cv::stereoRectify`` (reference: Snake/Preprocess/StereoTransforms.cpp:
19-95): computes the rectifying rotations for both cameras
(Fusiello-style), the shared rectified intrinsics, and the ``bf`` product,
and provides batched keypoint rectification (undistort -> rotate ->
reproject) matching the per-keypoint path in Preprocess.cpp:55-77.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from snakeslam_tpu.core.camera import Distortion, Pinhole, undistort


@dataclass
class Rectification:
    R_rect: np.ndarray       # (3, 3) rectifying rotation for this camera
    cam_old: Pinhole         # original intrinsics
    cam_new: Pinhole         # rectified intrinsics (shared by the pair)
    distortion: Distortion | None

    def rectify_points(self, uv: np.ndarray) -> np.ndarray:
        """Pixels in the raw image -> pixels in the rectified image."""
        uvj = jnp.asarray(uv, dtype=jnp.float64)
        xn = self.cam_old.unproject_pixels(uvj)
        if self.distortion is not None and not self.distortion.is_zero():
            xn = undistort(xn, self.distortion)
        ones = jnp.ones(xn.shape[:-1] + (1,), dtype=xn.dtype)
        rays = jnp.concatenate([xn, ones], axis=-1)
        rot = rays @ jnp.asarray(self.R_rect).T
        xn2 = rot[..., :2] / rot[..., 2:3]
        return np.asarray(self.cam_new.project_normalized(xn2))


def stereo_rectify(
    cam_left: Pinhole,
    cam_right: Pinhole,
    R_rl: np.ndarray,
    t_rl: np.ndarray,
    dist_left: Distortion | None = None,
    dist_right: Distortion | None = None,
):
    """Compute rectifying transforms for a calibrated stereo pair.

    Args:
      R_rl, t_rl: extrinsics mapping left-camera coords to right-camera
        coords (x_r = R_rl x_l + t_rl).
    Returns (rect_left, rect_right, bf): Rectification for each camera and
    the baseline*focal product of the rectified pair.
    """
    R_rl = np.asarray(R_rl, dtype=np.float64)
    t_rl = np.asarray(t_rl, dtype=np.float64)
    # right camera center in the left frame
    c_r = -R_rl.T @ t_rl
    baseline = np.linalg.norm(c_r)
    x_new = c_r / max(baseline, 1e-12)
    if x_new[0] < 0:
        x_new = -x_new
    # split the relative rotation evenly between the two views for minimal
    # distortion: z from the average optical axis
    w = _log_rotation(R_rl)
    R_half = _exp_rotation(-0.5 * w)  # rotate left halfway toward right
    z_avg = R_half @ np.array([0.0, 0.0, 1.0])
    y_new = np.cross(z_avg, x_new)
    y_new /= max(np.linalg.norm(y_new), 1e-12)
    z_new = np.cross(x_new, y_new)
    R_rect_l = np.stack([x_new, y_new, z_new])       # rows = new axes
    R_rect_r = R_rect_l @ R_rl.T

    fx = 0.5 * (float(np.asarray(cam_left.fx)) + float(np.asarray(cam_right.fx)))
    fy = 0.5 * (float(np.asarray(cam_left.fy)) + float(np.asarray(cam_right.fy)))
    cx = float(np.asarray(cam_left.cx))
    cy = 0.5 * (float(np.asarray(cam_left.cy)) + float(np.asarray(cam_right.cy)))
    cam_new = Pinhole.create(fx, fy, cx, cy, dtype=jnp.float64)

    rect_l = Rectification(R_rect_l, cam_left, cam_new, dist_left)
    rect_r = Rectification(R_rect_r, cam_right, cam_new, dist_right)
    return rect_l, rect_r, fx * baseline


def _log_rotation(R: np.ndarray) -> np.ndarray:
    from snakeslam_tpu.core import lie

    return np.asarray(lie.so3_log(jnp.asarray(R, dtype=jnp.float64)))


def _exp_rotation(w: np.ndarray) -> np.ndarray:
    from snakeslam_tpu.core import lie

    return np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float64)))
