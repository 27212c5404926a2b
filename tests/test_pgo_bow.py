"""Pose-graph optimization + BoW vocabulary tests."""

import numpy as np
import jax.numpy as jnp

from snakeslam_tpu.core import lie
from snakeslam_tpu.ops import bow as BOW
from snakeslam_tpu.ops.pgo import PoseGraph, solve_pgo

F64 = jnp.float64


def _ring_graph(rng, V=30, drift=0.02, use_sim3=False, scale_drift=0.0):
    """Ground-truth poses on a loop; odometry edges with drift; one loop
    closure edge with the exact measurement."""
    poses_true = []
    for k in range(V):
        a = 2 * np.pi * k / V
        T = np.eye(4)
        c, s = np.cos(a), np.sin(a)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T[:3, 3] = [3 * np.sin(a), 0.0, 3 * (1 - np.cos(a))]
        poses_true.append(np.linalg.inv(T))  # world->cam
    poses_true = np.stack(poses_true)

    # odometry with accumulated drift
    est = [poses_true[0]]
    edges = []
    for k in range(1, V):
        rel_true = poses_true[k] @ np.linalg.inv(poses_true[k - 1])
        noise = rng.normal(size=6) * drift
        xi = noise
        if use_sim3:
            xi7 = np.concatenate([noise, [rng.normal() * scale_drift]])
            rel_noisy = np.asarray(
                lie.sim3_exp(jnp.asarray(xi7, F64))
            ) @ rel_true
        else:
            rel_noisy = np.asarray(
                lie.se3_exp(jnp.asarray(xi, F64))
            ) @ rel_true
        est.append(rel_noisy @ est[-1])
        edges.append((k - 1, k, rel_true))
    # loop edge: V-1 -> 0 with true relative pose
    rel_loop = poses_true[0] @ np.linalg.inv(poses_true[-1])
    edges.append((V - 1, 0, rel_loop))
    est = np.stack(est)

    E = len(edges)
    graph = PoseGraph(
        poses=jnp.asarray(est, F64),
        fixed=jnp.asarray([k == 0 for k in range(V)]),
        valid=jnp.ones(V, dtype=bool),
        edge_i=jnp.asarray([e[0] for e in edges], dtype=jnp.int32),
        edge_j=jnp.asarray([e[1] for e in edges], dtype=jnp.int32),
        edge_T=jnp.asarray(np.stack([e[2] for e in edges]), F64),
        edge_weight=jnp.ones(E, dtype=F64),
        edge_valid=jnp.ones(E, dtype=bool),
    )
    return graph, poses_true, est


def _max_pose_err(poses, poses_true):
    errs = []
    for k in range(len(poses_true)):
        d = np.asarray(lie.se3_log(jnp.asarray(
            np.asarray(poses[k]) @ np.linalg.inv(poses_true[k]), F64
        )))
        errs.append(np.abs(d).max())
    return max(errs)


def test_pgo_se3_closes_loop(rng):
    graph, poses_true, est = _ring_graph(rng, drift=0.02)
    err_before = _max_pose_err(np.asarray(graph.poses), poses_true)
    poses, cost = solve_pgo(graph, iterations=25)
    err_after = _max_pose_err(np.asarray(poses), poses_true)
    assert err_after < 0.25 * err_before
    assert float(cost) < 1e-2


def test_pgo_sim3_absorbs_scale_drift(rng):
    graph, poses_true, est = _ring_graph(
        rng, drift=0.01, use_sim3=True, scale_drift=0.01
    )
    poses, cost = solve_pgo(graph, iterations=30, use_sim3=True)
    # scales should return close to 1 after closing the loop
    scales = np.asarray(lie.sim3_scale(poses))
    assert np.abs(np.log(scales)).max() < 0.05
    err_after = _max_pose_err(
        np.asarray(jnp.asarray(
            [np.asarray(lie.sim3_to_se3(poses[k])) for k in range(len(poses))]
        )), poses_true,
    )
    assert err_after < 0.15


def test_vocabulary_transform_and_score(rng):
    train = rng.integers(0, 2, size=(4000, 256)).astype(np.int8)
    voc = BOW.train_vocabulary(train, k=8, levels=3, seed=1)
    assert voc.n_words == 512

    descs_a = jnp.asarray(rng.integers(0, 2, size=(300, 256)).astype(np.int8))
    valid = jnp.ones(300, dtype=bool)
    words_a, va = BOW.transform(voc, descs_a, valid)
    assert float(jnp.sum(va)) > 0.99  # L1-normalized
    # same descriptors -> score 1; disjoint random -> low score
    _, va2 = BOW.transform(voc, descs_a, valid)
    assert float(BOW.score_l1(va, va2)) > 0.999
    descs_b = jnp.asarray(rng.integers(0, 2, size=(300, 256)).astype(np.int8))
    _, vb = BOW.transform(voc, descs_b, valid)
    s_cross = float(BOW.score_l1(va, vb))
    assert s_cross < 0.9

    # overlapping sets score between
    mixed = jnp.concatenate([descs_a[:150], descs_b[:150]])
    _, vm = BOW.transform(voc, mixed, valid)
    s_mix = float(BOW.score_l1(va, vm))
    assert s_cross < s_mix < 1.0


def test_transform_packed_matches_unpacked(rng):
    """The packed XOR+popcount descent must agree exactly with the float
    einsum descent (same tree walk, same word ids, same vector)."""
    train = rng.integers(0, 2, size=(4000, 256)).astype(np.int8)
    voc = BOW.train_vocabulary(train, k=8, levels=3, seed=1)
    bits = rng.integers(0, 2, size=(300, 256)).astype(np.int8)
    packed = np.packbits(bits.astype(np.uint8), axis=-1, bitorder="little")
    w_ref, v_ref = BOW.transform_np(voc, bits)
    w_pk, v_pk = BOW.transform_packed_np(voc, packed)
    np.testing.assert_array_equal(w_ref, w_pk)
    np.testing.assert_allclose(v_ref, v_pk, rtol=1e-12)


def test_vocabulary_save_load(tmp_path, rng):
    train = rng.integers(0, 2, size=(1000, 256)).astype(np.int8)
    voc = BOW.train_vocabulary(train, k=5, levels=2)
    BOW.save_vocabulary(voc, tmp_path / "voc.npz")
    voc2 = BOW.load_vocabulary(tmp_path / "voc.npz")
    d = jnp.asarray(rng.integers(0, 2, size=(50, 256)).astype(np.int8))
    w1, v1 = BOW.transform(voc, d, jnp.ones(50, dtype=bool))
    w2, v2 = BOW.transform(voc2, d, jnp.ones(50, dtype=bool))
    assert (np.asarray(w1) == np.asarray(w2)).all()
