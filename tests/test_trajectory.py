import numpy as np

from snakeslam_tpu.core.trajectory import associate, ate_rmse, read_tum, umeyama, write_tum


def test_umeyama_exact(rng):
    src = rng.normal(size=(50, 3))
    # ground-truth similarity
    angle = 0.7
    R_gt = np.array(
        [
            [np.cos(angle), -np.sin(angle), 0],
            [np.sin(angle), np.cos(angle), 0],
            [0, 0, 1],
        ]
    )
    s_gt, t_gt = 2.5, np.array([1.0, -2.0, 3.0])
    dst = (s_gt * (R_gt @ src.T)).T + t_gt
    s, R, t = umeyama(src, dst, with_scale=True)
    assert np.isclose(s, s_gt)
    assert np.abs(R - R_gt).max() < 1e-9
    assert np.abs(t - t_gt).max() < 1e-9


def test_ate_zero_for_aligned(rng):
    traj = rng.normal(size=(100, 3))
    rmse, scale = ate_rmse(traj * 3.0, traj, with_scale=True)
    assert rmse < 1e-9
    assert np.isclose(scale, 1 / 3.0)
    rmse_se3, _ = ate_rmse(traj, traj, with_scale=False)
    assert rmse_se3 < 1e-12


def test_tum_roundtrip(tmp_path, rng):
    ts = np.arange(10) * 0.05
    pos = rng.normal(size=(10, 3))
    q = rng.normal(size=(10, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q *= np.where(q[:, :1] < 0, -1, 1)
    path = tmp_path / "traj.tum"
    write_tum(path, ts, pos, q)
    ts2, pos2, q2 = read_tum(path)
    assert np.abs(ts - ts2).max() < 1e-9
    assert np.abs(pos - pos2).max() < 1e-8
    assert np.abs(q - q2).max() < 1e-8


def test_associate():
    ta = np.array([0.0, 1.0, 2.0, 3.0])
    tb = np.array([0.01, 1.5, 2.99])
    ia, ib = associate(ta, tb, max_dt=0.05)
    assert list(ia) == [0, 3]
    assert list(ib) == [0, 2]


def test_frame_overlay_export(tmp_path):
    """ViewerFrame overlay PNG export (the headless viewer-frame stream,
    ViewerInterface.cpp:15-72)."""
    from snakeslam_tpu.map.slam_map import FrameData
    from snakeslam_tpu.viewer.export import FrameOverlayWriter

    rng = np.random.default_rng(0)
    uv = rng.uniform(10, 100, (40, 2))
    frame = FrameData(
        frame_id=20, timestamp=1.0, uv=uv,
        octave=np.zeros(40, dtype=np.int32),
        angle=np.zeros(40, dtype=np.float32),
        descriptors=rng.integers(0, 256, (40, 32), dtype=np.uint8),
        right=np.full(40, -1.0), depth=np.full(40, -1.0),
    )
    frame.matches = np.where(np.arange(40) % 2 == 0, 5, -1)
    w = FrameOverlayWriter(tmp_path, every_n=10, size=(128, 128))
    p = w.on_frame(frame)
    assert p is not None and p.exists() and p.stat().st_size > 0
    frame.frame_id = 21
    assert w.on_frame(frame) is None  # off-cadence frames are skipped
    img = np.asarray(__import__("PIL.Image", fromlist=["Image"]).open(p))
    assert (img[..., 1] > 150).any() and (img[..., 0] > 150).any()
