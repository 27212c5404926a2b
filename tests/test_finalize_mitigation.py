"""End-of-run bad-section mitigation (System.cpp:167-184).

The reference marks the keyframes of the trailing ~30 frames with
``cull_factor = 5`` (past the force-cull threshold,
Simplification.cpp:148-153) and pushes them through simplification before
the final BA passes, so a bad trailing section — the part of the run that
never received back-end polish — cannot poison the final map.  These tests
corrupt a trailing keyframe's pose and verify that ``SlamSystem.finalize``
culls it and that the trajectory recovers after the final passes.
"""

import numpy as np

from snakeslam_tpu.frontend.synthetic_source import (
    apply_world_to_settings,
    synthetic_frames,
)
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory


def _dense_kf_run(n_frames=60, seed=11):
    settings = Settings()
    settings.input_type = InputType.Stereo
    settings.feature_slots = 1024
    settings.local_map_slots = 2048
    settings.lba_cam_slots = 24
    settings.lba_point_slots = 4096
    settings.lba_obs_slots = 8
    settings.th_depth = 25.0
    world = SyntheticWorld(n_points=3000, seed=seed)
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)
    frames = list(synthetic_frames(
        world, orbit_trajectory(n_frames, radius=7.0, arc=0.8),
        settings, noise_px=0.3,
    ))
    # dense timestamps force the 0.5 s keyframe rule to fire often, so the
    # trailing 30-frame section contains several interior keyframes
    for f in frames:
        f.timestamp = f.frame_id / 10.0
    for f in frames:
        system.process_frame(f)
    return system


def _interior_trailing(smap):
    valid = smap.valid_keyframes()
    order = valid[np.argsort(smap.kf_frame_id[valid])]
    last_fid = int(smap.kf_frame_id[order[-1]])
    return [int(k) for k in order[:-1]
            if smap.kf_frame_id[k] > last_fid - 30
            and smap.kf_prev[k] >= 0 and smap.kf_next[k] >= 0]


def test_finalize_culls_corrupted_trailing_keyframe():
    system = _dense_kf_run()
    smap = system.map
    assert smap.n_keyframes >= 5, "need several keyframes for the scenario"
    trailing = _interior_trailing(smap)
    assert trailing, "scenario needs an interior keyframe in the last 30 frames"
    bad = trailing[-1]
    # corrupt the keyframe: a large pose error simulating a bad section
    smap.kf_pose[bad][:3, 3] += np.array([1.5, -1.0, 0.8])

    system.finalize(gba_iterations=3)

    assert not smap.kf_valid[bad], \
        "finalize should force-cull the corrupted trailing keyframe"
    # the final realign passes re-pose the trajectory against the cleaned
    # map, so the corrupted section must not leak into the final ATE
    rmse, _, n = system.ate_against_gt(with_scale=False)
    assert n >= 50
    assert rmse < 0.05, f"final ATE {rmse:.4f} after mitigation"


def test_finalize_marks_trailing_cull_factor():
    system = _dense_kf_run(n_frames=50, seed=13)
    smap = system.map
    valid = smap.valid_keyframes()
    order = valid[np.argsort(smap.kf_frame_id[valid])]
    last_fid = int(smap.kf_frame_id[order[-1]])
    pre_trailing = [int(k) for k in order
                    if smap.kf_frame_id[k] > last_fid - 30]
    assert pre_trailing
    system.finalize(gba_iterations=2)
    # every trailing keyframe that survived the forced simplification pass
    # (the chain endpoints always do) carries the raised culling bias
    survivors = [k for k in pre_trailing if smap.kf_valid[k]]
    assert survivors, "chain endpoints always survive"
    assert all(smap.kf_cull_factor[k] == 5.0 for k in survivors)
