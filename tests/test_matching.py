import numpy as np
import jax.numpy as jnp

from snakeslam_tpu.core.camera import Pinhole
from snakeslam_tpu.core.pyramid import ScalePyramid
from snakeslam_tpu.ops import matching as M
from snakeslam_tpu.ops.descriptors import (
    hamming_matrix,
    hamming_np,
    pack_bits_np,
    unpack_bits,
    unpack_bits_np,
)
from snakeslam_tpu.utils.synthetic import SyntheticWorld, lookat_pose_cw


def test_unpack_roundtrip(rng):
    packed = rng.integers(0, 256, size=(64, 32), dtype=np.uint8)
    bits_np = unpack_bits_np(packed)
    bits_dev = np.asarray(unpack_bits(jnp.asarray(packed)))
    assert (bits_np == bits_dev).all()
    assert (pack_bits_np(bits_np) == packed).all()


def test_hamming_matmul_vs_oracle(rng):
    a = rng.integers(0, 256, size=(100, 32), dtype=np.uint8)
    b = rng.integers(0, 256, size=(77, 32), dtype=np.uint8)
    oracle = hamming_np(a, b)
    dev = np.asarray(
        hamming_matrix(
            jnp.asarray(unpack_bits_np(a)), jnp.asarray(unpack_bits_np(b))
        )
    )
    assert (oracle == dev).all()
    assert dev.min() >= 0 and dev.max() <= 256


def test_knn2_ratio_match(rng):
    # b = permuted copies of a with few bit flips + distractors
    n = 120
    a = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    perm = rng.permutation(n)
    b = a[perm].copy()
    flips = rng.random((n, 256)) < 0.01
    b ^= np.packbits(flips, axis=1, bitorder="little")
    distract = rng.integers(0, 256, size=(60, 32), dtype=np.uint8)
    b_all = np.concatenate([b, distract])

    idx, dist = M.knn2_ratio_match(
        jnp.asarray(unpack_bits_np(a)),
        jnp.asarray(unpack_bits_np(b_all)),
        jnp.ones(n, dtype=bool),
        jnp.ones(len(b_all), dtype=bool),
        ratio=0.8,
    )
    idx = np.asarray(idx)
    matched = idx >= 0
    assert matched.sum() > n * 0.9
    # every match must be the true correspondence
    inv = np.empty(n, dtype=int)
    inv[perm] = np.arange(n)
    assert (idx[matched] == inv[np.nonzero(matched)[0]]).all()


def _world_two_views():
    world = SyntheticWorld(n_points=1500, seed=3)
    pose0 = lookat_pose_cw(np.array([0.0, 0.0, -30.0]), np.zeros(3))
    f0 = world.observe(pose0, max_features=900, noise_px=0.2, n_clutter=40)
    pose1 = lookat_pose_cw(np.array([0.4, 0.1, -29.5]), np.array([0.05, 0, 0]))
    f1 = world.observe(pose1, max_features=900, noise_px=0.2, n_clutter=40)
    return world, pose0, f0, pose1, f1


def _pad_frame(f, n_slots):
    n = len(f.uv)
    pad = n_slots - n
    assert pad >= 0
    return M.FrameFeatures(
        uv=jnp.asarray(np.pad(f.uv, ((0, pad), (0, 0))), dtype=jnp.float32),
        right=jnp.asarray(np.pad(f.right, (0, pad), constant_values=-1),
                          dtype=jnp.float32),
        octave=jnp.asarray(np.pad(f.octave, (0, pad))),
        angle=jnp.asarray(np.pad(f.angle, (0, pad)), dtype=jnp.float32),
        desc_bits=jnp.asarray(
            np.pad(unpack_bits_np(f.descriptors), ((0, pad), (0, 0)))
        ),
        valid=jnp.asarray(np.arange(n_slots) < n),
    )


def _points_from_frame(world, f0, n_slots):
    """Local map points = landmarks seen in f0, ref data from f0."""
    sel = f0.point_id >= 0
    pid = f0.point_id[sel]
    n = len(pid)
    pad = n_slots - n
    pos = world.points[pid]
    cam_pos = -f0.pose_cw[:3, :3].T @ f0.pose_cw[:3, 3]
    normal = cam_pos[None, :] - pos
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    lm = M.LocalMapPoints(
        position=jnp.asarray(np.pad(pos, ((0, pad), (0, 0))), dtype=jnp.float32),
        normal=jnp.asarray(np.pad(normal, ((0, pad), (0, 0))), dtype=jnp.float32),
        desc_bits=jnp.asarray(
            np.pad(unpack_bits_np(f0.descriptors[sel]), ((0, pad), (0, 0)))
        ),
        ref_depth=jnp.asarray(np.pad(world.ref_depth[pid], (0, pad)),
                              dtype=jnp.float32),
        ref_level=jnp.asarray(np.pad(f0.octave[sel], (0, pad))),
        angle=jnp.asarray(np.pad(f0.angle[sel], (0, pad)), dtype=jnp.float32),
        valid=jnp.asarray(np.arange(n_slots) < n),
    )
    return lm, pid


def test_search_by_projection_fine():
    world, pose0, f0, pose1, f1 = _world_two_views()
    N = 1024
    P = 1024
    lm, pid = _points_from_frame(world, f0, P)
    frame = _pad_frame(f1, N)
    cam = Pinhole.create(world.fx, world.fy, world.cx, world.cy)
    st = M.ScaleTables.from_pyramid(world.pyramid)
    out = M.search_by_projection_fine(
        lm, frame, jnp.asarray(pose1, dtype=jnp.float32), cam,
        jnp.float32(world.bf), (0, 0, world.image_size[0], world.image_size[1]),
        st, feat_free=frame.valid, th=1.0, ratio=0.9,
    )
    feat_point = np.asarray(out["feat_point"])
    n_feat = len(f1.uv)
    matched = np.nonzero(feat_point[:n_feat] >= 0)[0]
    assert len(matched) > 200
    # verify assignments against ground truth ids
    correct = f1.point_id[matched] == pid[feat_point[matched]]
    assert correct.mean() > 0.95


def test_search_by_projection_coarse_and_rotation():
    world, pose0, f0, pose1, f1 = _world_two_views()
    N, P = 1024, 1024
    lm, pid = _points_from_frame(world, f0, P)
    frame = _pad_frame(f1, N)
    cam = Pinhole.create(world.fx, world.fy, world.cx, world.cy)
    st = M.ScaleTables.from_pyramid(world.pyramid)
    out = M.search_by_projection_coarse(
        lm, frame, jnp.asarray(pose1, dtype=jnp.float32), cam,
        jnp.float32(world.bf), (0, 0, world.image_size[0], world.image_size[1]),
        st, feat_free=frame.valid, th=15.0,
    )
    feat_point = np.asarray(out["feat_point"])
    n_feat = len(f1.uv)
    matched = np.nonzero(feat_point[:n_feat] >= 0)[0]
    assert len(matched) > 200
    correct = f1.point_id[matched] == pid[feat_point[matched]]
    assert correct.mean() > 0.95


def test_rotation_filter_rejects_outlier_bins(rng):
    n = 200
    feat_point = jnp.asarray(np.arange(n, dtype=np.int32))
    point_angle = rng.uniform(0, 360, n).astype(np.float32)
    feat_angle = point_angle.copy()
    # consistent: all diff 0 -> bin 0 kept
    bad = rng.choice(n, size=12, replace=False)  # < 10% of max bin -> culled
    feat_angle[bad] = (point_angle[bad] + 117.0) % 360  # inconsistent bin
    out = np.asarray(
        M.rotation_consistency_filter(
            feat_point, jnp.asarray(point_angle), jnp.asarray(feat_angle)
        )
    )
    assert (out[bad] == -1).all()
    good = np.setdiff1d(np.arange(n), bad)
    assert (out[good] >= 0).all()


def test_resolve_matches_unique():
    # two points claim the same feature -> lower distance wins
    best_feat = jnp.asarray(np.array([5, 5, 7], dtype=np.int32))
    best_dist = jnp.asarray(np.array([30, 20, 10], dtype=np.int32))
    ok = jnp.asarray(np.array([True, True, True]))
    fp = np.asarray(M._resolve_matches(best_feat, best_dist, ok, 10))
    assert fp[5] == 1 and fp[7] == 2
    assert (fp[np.setdiff1d(np.arange(10), [5, 7])] == -1).all()
