"""End-to-end SLAM on RENDERED imagery: pixels -> ORB -> stereo -> map.

Every other e2e test replays pre-extracted synthetic features (the
reference's feature-cache mode).  Here the full image front-end runs on
rendered 3D views with real parallax and occlusion-ordered billboards —
the closest available stand-in for dataset validation in a zero-egress
environment (reference validates on EuRoC, README.md).
"""

import numpy as np
import pytest

from snakeslam_tpu.frontend.feature_detector import FeatureDetector
from snakeslam_tpu.frontend.preprocess import Preprocess
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.utils.render_world import render_sequence
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory


@pytest.mark.slow
def test_rendered_stereo_pipeline_tracks():
    world = SyntheticWorld(n_points=900, seed=3, image_size=(320, 240),
                           fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                           baseline=0.12, extent=8.0)
    s = Settings()
    s.input_type = InputType.Stereo
    s.enable_imu = False
    s.width, s.height = 320, 240
    s.fx, s.fy, s.cx, s.cy = 260.0, 260.0, 160.0, 120.0
    s.bf = 260.0 * 0.12
    s.fd_features = 600
    s.feature_slots = 1024
    s.local_map_slots = 2048
    s.lba_cam_slots = 16
    s.lba_point_slots = 2048
    s.lba_obs_slots = 8
    s.th_depth = 20.0

    detector = FeatureDetector(s)
    pre = Preprocess(s)
    system = SlamSystem(s)

    n_frames = 50
    gt = []
    tracked = 0
    for i, (ts, T_cw, left, right) in enumerate(render_sequence(
            world, orbit_trajectory(n_frames, radius=6.5, arc=0.5,
                                    fps=20.0))):
        frame = detector.detect(left, i, ts)
        right_feats = detector.detect(right, i + 10_000_000, ts)
        pre.stereo_match(frame, right_feats)
        frame.gt_pose_cw = T_cw
        system.process_frame(frame)
        gt.append((frame, T_cw))
        if frame.pose_cw is not None:
            tracked += 1

    assert tracked >= int(0.9 * n_frames), f"tracked only {tracked}"
    assert system.map.n_keyframes >= 2
    assert system.map.n_points > 100

    # ATE vs ground truth over tracked frames (SE3 alignment)
    est = np.array([np.linalg.inv(f.pose_cw)[:3, 3] for f, _ in gt
                    if f.pose_cw is not None])
    ref = np.array([np.linalg.inv(T)[:3, 3] for f, T in gt
                    if f.pose_cw is not None])
    mu_e, mu_r = est.mean(0), ref.mean(0)
    E, R0 = est - mu_e, ref - mu_r
    U, _, Vt = np.linalg.svd(E.T @ R0)
    S = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R = (U @ S @ Vt).T
    aligned = (R @ E.T).T + mu_r
    rmse = float(np.sqrt(((aligned - ref) ** 2).sum(axis=1).mean()))
    # billboards are planar sprites, ORB localization is a couple px --
    # a loose-but-meaningful gate on a 6.5 m-radius arc
    assert rmse < 0.25, f"rendered-image ATE {rmse:.3f} m"
