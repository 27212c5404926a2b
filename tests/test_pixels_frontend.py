"""Batched pixels front-end (frontend/pixels.py) vs the per-frame path.

The chunked stereo_frontend_batch must produce the same features and
stereo depths as FeatureDetector.detect + Preprocess.stereo_match frame
by frame — it is the same computation re-batched into one dispatch
(reference: Snake/Preprocess/FeatureDetector.cpp:58-80 overlapped
detection + Preprocess.cpp:122-242 stereo matching).
"""

import numpy as np

from snakeslam_tpu.frontend.feature_detector import FeatureDetector
from snakeslam_tpu.frontend.pixels import StereoPixelSource
from snakeslam_tpu.frontend.preprocess import Preprocess
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.utils.render_world import render_sequence
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory


def _settings():
    s = Settings()
    s.input_type = InputType.Stereo
    s.enable_imu = False
    s.width, s.height = 320, 240
    s.fx, s.fy, s.cx, s.cy = 260.0, 260.0, 160.0, 120.0
    s.bf = 260.0 * 0.12
    s.fd_features = 300
    s.fd_levels = 2
    return s


def test_stereo_frontend_batch_matches_per_frame():
    world = SyntheticWorld(n_points=400, seed=5, image_size=(320, 240),
                           fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                           baseline=0.12, extent=8.0)
    s = _settings()
    seq = list(render_sequence(world, orbit_trajectory(4, radius=6.5,
                                                       arc=0.08, fps=20.0)))
    lefts = np.stack([l for _, _, l, _ in seq])
    rights = np.stack([r for _, _, _, r in seq])

    src = StereoPixelSource(s)
    outs = src.dispatch(lefts, rights)
    frames_b = src.materialize(outs, range(len(seq)),
                               [t for t, _, _, _ in seq])

    det = FeatureDetector(s)
    pre = Preprocess(s)
    for i, (ts, _, left, right) in enumerate(seq):
        f = det.detect(left, i, ts)
        rf = det.detect(right, i + 10_000_000, ts)
        pre.stereo_match(f, rf)
        b = frames_b[i]
        assert b.n == f.n, f"frame {i}: {b.n} vs {f.n} features"
        assert np.allclose(b.uv, f.uv, atol=1e-3)
        assert np.array_equal(b.octave, f.octave)
        assert np.array_equal(b.descriptors, f.descriptors)
        # same stereo matches (identical gates over the same Hamming
        # matrix; allow a whisker of float noise in the depths)
        assert np.array_equal(b.depth > 0, f.depth > 0)
        got = b.depth[b.depth > 0]
        want = f.depth[f.depth > 0]
        assert np.allclose(got, want, rtol=1e-4)
        n_matched = int((b.depth > 0).sum())
        assert n_matched >= 0.3 * b.n, (
            f"frame {i}: only {n_matched}/{b.n} stereo-matched")


def test_pixel_sequence_windowed_tracks():
    """PixelFrameSequence + WindowedRunner: the full pixels-in pipeline
    (lazy chunked extraction feeding speculative scan windows) tracks a
    rendered stereo orbit — the bench e2e_pixels lane at test scale."""
    from snakeslam_tpu.frontend.pixels import PixelFrameSequence
    from snakeslam_tpu.system.slam import SlamSystem
    from snakeslam_tpu.tracking.windowed import WindowedRunner

    world = SyntheticWorld(n_points=900, seed=3, image_size=(320, 240),
                           fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                           baseline=0.12, extent=8.0)
    s = _settings()
    s.fd_features = 600
    s.fd_levels = 4
    s.feature_slots = 1024
    s.local_map_slots = 2048
    s.lba_cam_slots = 16
    s.lba_point_slots = 2048
    s.lba_obs_slots = 8
    s.th_depth = 20.0

    n_frames = 48
    L, R, ts, gt = [], [], [], []
    for t, T_cw, left, right in render_sequence(
            world, orbit_trajectory(n_frames, radius=6.5, arc=0.5,
                                    fps=20.0)):
        L.append(left.astype(np.uint8))
        R.append(right.astype(np.uint8))
        ts.append(t)
        gt.append(T_cw)
    seq = PixelFrameSequence(s, np.stack(L), np.stack(R), ts, gt, chunk=16)
    system = SlamSystem(s)
    WindowedRunner(system, window=16, two_stage=True).run(seq)

    tracked = len(system.tracker.trajectory)
    assert tracked >= int(0.9 * n_frames), f"tracked only {tracked}"
    assert system.map.n_keyframes >= 2
    assert system.map.n_points > 100
    rmse, _, _ = system.ate_against_gt(with_scale=False)
    # billboards are planar fixed-size sprites (built-in multi-view
    # inconsistency) and speculative windows track on a slightly stale
    # snapshot; observed RMSE ~0.25 m on this 0.5 rad arc — gate at ~1.4x
    # observed so the hard correctness gates stay the tracked fraction and
    # map growth above
    assert rmse < 0.35, f"pixels-in windowed ATE {rmse:.3f} m (observed ~0.25)"
