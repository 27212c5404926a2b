"""Loop-detector retrieval + geometric verification unit tests.

Covers the two reference behaviors the round-3 review called out:

1. covisibility-group accumulated candidate scoring
   (reference: Snake/LoopClosing/KeyframeDatabase.cpp:58-170) — several
   weak covisible neighbors of a true revisit must jointly outrank (and
   out-clear the min-score floor against) one lucky unrelated keyframe;

2. post-RANSAC geometric verification
   (reference: Snake/LoopClosing/LoopDetector.cpp:210-375) — a
   geometrically wrong Sim3 hypothesis that survives RANSAC noise must be
   rejected by the guided projection re-search + pose-refine gates, while
   the true hypothesis passes.
"""

import numpy as np
import pytest

from snakeslam_tpu.loop.keyframe_database import KeyframeDatabase
from snakeslam_tpu.loop.loop_closing import LoopClosing
from snakeslam_tpu.map.slam_map import FrameData, SlamMap
from snakeslam_tpu.ops import bow as BOW
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.utils.synthetic import SyntheticWorld, lookat_pose_cw


def _frame(frame_id, desc, pose_cw=None, uv=None, right=None, depth=None):
    n = len(desc)
    if pose_cw is None:
        pose_cw = np.eye(4)
    if uv is None:
        uv = np.tile(np.array([100.0, 100.0]), (n, 1))
    fd = FrameData(
        frame_id=frame_id, timestamp=float(frame_id),
        uv=np.asarray(uv, dtype=np.float64),
        octave=np.zeros(n, dtype=np.int32),
        angle=np.zeros(n, dtype=np.float32),
        descriptors=np.asarray(desc, dtype=np.uint8),
        right=np.full(n, -1.0) if right is None else np.asarray(right),
        depth=np.full(n, -1.0) if depth is None else np.asarray(depth),
    )
    fd.pose_cw = pose_cw
    return fd


def test_group_accumulated_scoring_beats_lucky_single():
    """A true revisit split over three weak covisible keyframes must win
    only through group accumulation: per-keyframe ranking puts the lucky
    unrelated keyframe first, the accumulated ranking puts the revisit
    group first, and an adaptive min-score floor above the lucky score
    keeps only the group (KeyframeDatabase.cpp:58-170)."""
    rng = np.random.default_rng(3)
    voc = BOW.random_vocabulary_cached(0)
    smap = SlamMap(max_keyframes=16, max_points=512, max_features=128)
    db = KeyframeDatabase(voc, smap)

    # 90 "scene" descriptors seen by the query; each group member re-sees an
    # overlapping 35-descriptor window of them (a weak partial revisit), the
    # lucky keyframe re-sees 40 of them (the strongest single hit) but has
    # no covisible support
    scene = rng.integers(0, 256, size=(90, 32), dtype=np.uint8)

    def filler(n):
        return rng.integers(0, 256, size=(n, 32), dtype=np.uint8)

    windows = [scene[0:35], scene[27:62], scene[55:90]]
    group = []
    for i, w in enumerate(windows):
        k = smap.allocate_keyframe(
            _frame(i, np.concatenate([w, filler(45)])))
        group.append(k)
    lucky = smap.allocate_keyframe(
        _frame(3, np.concatenate([scene[20:60], filler(40)])))
    query = smap.allocate_keyframe(_frame(4, np.concatenate([scene,
                                                             filler(10)])))

    # group members covisible through 20 shared map points (>= the
    # min_weight=15 the accumulation walk uses); lucky shares nothing
    for j in range(20):
        pt = smap.allocate_point(np.array([0.0, 0.0, float(j + 2)]),
                                 scene[j], group[0], 1.0, 0,
                                 np.array([0.0, 0.0, 1.0]))
        for gi, k in enumerate(group):
            smap.add_observation(k, j, pt)

    for k in group + [lucky, query]:
        db.add(k)

    # --- per-keyframe ranking: lucky wins (the failure mode) ---
    ids_single, scores_single = db.query(
        db.vectors[query], words=db.words[query],
        exclude={query}, min_score=0.0, top_n=5)
    assert len(ids_single) >= 2
    by_score = {int(i): float(s) for i, s in zip(ids_single, scores_single)}
    assert lucky in by_score, "lucky single hit filtered unexpectedly"
    lucky_score = by_score[lucky]
    assert int(ids_single[0]) == lucky, (
        "test premise: the unrelated keyframe must be the best SINGLE hit "
        f"(got {ids_single}, {scores_single})")

    # --- accumulated ranking: the revisit group wins ---
    ids_acc, scores_acc = db.detect_loop_candidates(
        query, min_score=0.0, top_n=5)
    assert len(ids_acc) >= 1
    assert int(ids_acc[0]) in set(group), (
        f"group accumulation must rank the revisit first, got {ids_acc}")

    # --- a floor above the lucky score keeps only the group ---
    ids_floor, _ = db.detect_loop_candidates(
        query, min_score=1.05 * lucky_score, top_n=5)
    kept = set(int(i) for i in ids_floor)
    assert kept and kept <= set(group), (
        f"floor {1.05 * lucky_score:.3f} must drop the lucky single hit, "
        f"kept {kept}")


def test_database_add_is_idempotent():
    """Re-adding a keyframe (back-end queues legitimately re-enqueue) must
    not duplicate its inverted-file entries: a duplicated keyframe counts
    every shared word twice, inflating max_common until the 0.8
    sharing-word ratio filter (KeyframeDatabase.cpp:71) rejects every
    honestly-counted candidate — the round-4 regression that silently
    killed loop detection on the rendered orbit."""
    rng = np.random.default_rng(4)
    voc = BOW.random_vocabulary_cached(0)
    smap = SlamMap(max_keyframes=16, max_points=512, max_features=128)
    db = KeyframeDatabase(voc, smap)

    scene = rng.integers(0, 256, size=(60, 32), dtype=np.uint8)
    true_c = smap.allocate_keyframe(_frame(0, scene))          # true revisit
    other = smap.allocate_keyframe(_frame(1, np.concatenate([
        scene[:30], rng.integers(0, 256, size=(30, 32), dtype=np.uint8)])))
    query = smap.allocate_keyframe(_frame(2, scene))
    db.add(true_c)
    db.add(other)
    counts_once = db._shared_word_counts(db.words[query]
                                         if query in db.words else
                                         db.compute_frame_vector(scene)[0])

    # re-add the weaker keyframe several times (the re-enqueue pattern)
    for _ in range(3):
        db.add(other)
    counts_again = db._shared_word_counts(np.unique(
        db.compute_frame_vector(scene)[0]))
    assert counts_again[other] == counts_once[other], (
        "duplicate add inflated shared-word counts")

    w_q, v_q = db.compute_frame_vector(scene)
    ids, _ = db.query(v_q, words=np.unique(w_q),
                      exclude={query}, min_score=0.0, top_n=2)
    assert int(ids[0]) == true_c, (
        f"true candidate must survive re-adds, got {ids}")


# ---------------------------------------------------------------------------


def _build_revisit_map():
    """Two stereo keyframes seeing the same landmarks from nearby poses,
    with map points allocated at ground truth — the minimal geometry the
    Sim3 verification re-search needs."""
    world = SyntheticWorld(n_points=3000, seed=5)
    settings = Settings()
    settings.input_type = InputType.Stereo
    settings.enable_imu = False
    settings.feature_slots = 512
    settings.local_map_slots = 1024
    settings.th_depth = 25.0
    from snakeslam_tpu.frontend.synthetic_source import (
        apply_world_to_settings,
    )

    apply_world_to_settings(world, settings)
    smap = SlamMap(max_keyframes=8, max_points=4096, max_features=512)
    voc = BOW.random_vocabulary_cached(0)
    db = KeyframeDatabase(voc, smap)
    lc = LoopClosing(settings, smap, db)

    pose_old = lookat_pose_cw(np.array([7.0, 0.0, 0.5]),
                              np.array([0.0, 0.0, 0.0]))
    pose_new = lookat_pose_cw(np.array([6.9, 0.25, 0.5]),
                              np.array([0.0, 0.1, 0.0]))

    frames = []
    for fid, pose in ((0, pose_old), (1, pose_new)):
        sf = world.observe(pose, timestamp=float(fid), max_features=400,
                           noise_px=0.2, n_clutter=20, with_stereo=True)
        fd = _frame(fid, sf.descriptors, pose_cw=pose, uv=sf.uv,
                    right=sf.right, depth=sf.depth)
        fd.octave = sf.octave
        fd.angle = sf.angle
        frames.append((smap.allocate_keyframe(fd), sf))

    (cand, sf_old), (kf, sf_new) = frames
    # map points at ground truth, observed by BOTH keyframes where shared;
    # normals follow the map convention: unit point->camera direction
    cam_old = -pose_old[:3, :3].T @ pose_old[:3, 3]
    pid_to_pt = {}
    for feat, pid in enumerate(sf_old.point_id):
        if pid < 0:
            continue
        normal = cam_old - world.points[pid]
        normal = normal / max(np.linalg.norm(normal), 1e-9)
        pt = smap.allocate_point(
            world.points[pid].copy(), sf_old.descriptors[feat].copy(),
            cand, float(sf_old.depth[feat]), 0, normal)
        smap.add_observation(cand, feat, pt)
        pid_to_pt[int(pid)] = pt
    n_shared = 0
    for feat, pid in enumerate(sf_new.point_id):
        pt = pid_to_pt.get(int(pid))
        if pt is not None:
            smap.add_observation(kf, feat, pt)
            n_shared += 1
    assert n_shared > 100, f"revisit overlap too small ({n_shared})"
    return lc, smap, kf, cand


@pytest.mark.slow
def test_sim3_verification_gates():
    """The guided-projection re-search + pose-refine verification
    (LoopDetector.cpp:210-375): the TRUE hypothesis (identity Sim3 — no
    drift injected) passes, while a geometrically wrong hypothesis that
    could survive Sim3-RANSAC on noisy correspondence sets is rejected."""
    lc, smap, kf, cand = _build_revisit_map()
    I3, z3 = np.eye(3), np.zeros(3)
    pairs = (np.array([], dtype=int), np.array([], dtype=int))

    ok = lc._verify_sim3(kf, cand, 1.0, I3, z3, pairs)
    assert ok is not None, "true hypothesis must pass verification"
    s_out, R_out, t_out, fuse_pairs = ok
    # refined correction must stay near identity (there is no drift)
    assert abs(s_out - 1.0) < 0.05
    assert np.linalg.norm(t_out) < 0.2
    assert np.arccos(np.clip((np.trace(R_out) - 1) / 2, -1, 1)) < 0.05
    # and produce a real fusion pair set from the re-search
    assert len(fuse_pairs[0]) >= 30

    # wrong hypothesis: 25 deg rotation + 2 m shift — projects the loop
    # points far from their true pixels, so the radius-5 re-search starves
    th = np.deg2rad(25.0)
    R_bad = np.array([[np.cos(th), -np.sin(th), 0.0],
                      [np.sin(th), np.cos(th), 0.0],
                      [0.0, 0.0, 1.0]])
    bad = lc._verify_sim3(kf, cand, 1.0, R_bad, np.array([2.0, -1.0, 0.5]),
                          pairs)
    assert bad is None, "wrong hypothesis must be rejected by the re-search"
