"""Trace the loop-detection chain on the rendered-pixels orbit scenario
(the red test test_rendered_loop_closure_from_pixels): log, per processed
keyframe, retrieval survivors/scores/min-score, temporal consistency, and
every verification gate so the stage that kills the true loop is visible.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", None)

import numpy as np

import snakeslam_tpu.loop.loop_closing as LC
from snakeslam_tpu.frontend.feature_detector import FeatureDetector
from snakeslam_tpu.frontend.preprocess import Preprocess
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.utils.render_world import render_sequence
from snakeslam_tpu.utils.synthetic import SyntheticWorld, loop_trajectory


def main():
    n_points = 680
    world = SyntheticWorld(n_points=n_points, seed=11, image_size=(320, 240),
                           fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                           baseline=0.12, extent=14.0)
    rng = np.random.default_rng(11 + 7)
    ang = rng.uniform(0, 2 * np.pi, n_points)
    rad = rng.uniform(9.5, 14.0, n_points)
    h = rng.uniform(-2.5, 3.5, n_points)
    world.points = np.stack(
        [rad * np.sin(ang), h, -rad * np.cos(ang)], axis=1)

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

    lc = system.loop_closing
    db = system.database
    smap = system.map

    # ---- instrumentation -------------------------------------------------
    orig_detect = lc._detect

    def traced_detect(kf):
        kfs = smap.valid_keyframes()
        seq = {int(k): i for i, k in enumerate(kfs)}
        out = orig_detect(kf)
        print(f"[detect] kf={kf} seq={seq.get(kf)} nkf={len(kfs)} "
              f"cons={lc.consistency_count} "
              f"-> {'HIT cand=%d' % out[0] if out is not None else 'none'}",
              flush=True)
        return out
    lc._detect = traced_detect

    orig_dlc = db.detect_loop_candidates

    def traced_dlc(kf, min_score, top_n=5, v=None, words=None,
                   extra_exclude=None):
        ids, scores = orig_dlc(kf, min_score, top_n=top_n, v=v, words=words,
                               extra_exclude=extra_exclude)
        # is the weak-covisibility exclusion eating the early keyframes?
        cov, w = smap.covisible_keyframes(kf, min_weight=1)
        early = [(int(c), int(wt)) for c, wt in zip(cov, w) if int(c) <= 12]
        print(f"  [db] kf={kf} min_score={min_score:.4f} "
              f"n_excl={len(extra_exclude or ())} "
              f"cov_early={early} "
              f"ids={list(ids[:5])} scores={np.round(scores[:5], 3)}",
              flush=True)
        return ids, scores
    db.detect_loop_candidates = traced_dlc

    orig_fs = db._filtered_scores

    def traced_fs(v, words, active):
        ids, scores = orig_fs(v, words, active)
        if smap.n_keyframes >= 125:
            counts = db._shared_word_counts(words)
            counts_m = counts.copy()
            counts_m[~active] = 0
            act_ids = np.nonzero(active)[0]
            plain = 1.0 - 0.5 * np.abs(
                v[None] - db.vectors[act_ids]).sum(axis=-1)
            order = np.argsort(-plain)[:8]
            top = [(int(act_ids[o]), round(float(plain[o]), 3),
                    int(counts_m[act_ids[o]])) for o in order]
            early = [(k, round(float(plain[np.nonzero(act_ids == k)[0][0]]),
                               3) if k in act_ids else None,
                      int(counts_m[k])) for k in range(0, 10)]
            print(f"    [fs] max_common={int(counts_m.max())} "
                  f"nact={len(act_ids)} nwords={len(np.unique(words))}\n"
                  f"         top={top}\n"
                  f"         early(id,plain,shared)={early}\n"
                  f"         survivors={list(ids[:8])}", flush=True)
        return ids, scores
    db._filtered_scores = traced_fs

    orig_cs = lc._compute_sim3

    def traced_cs(kf, cand):
        pairs = lc._match_points(kf, cand)
        npairs = 0 if pairs is None else len(pairs[0])
        out = orig_cs(kf, cand)
        print(f"  [sim3] kf={kf} cand={cand} pairs={npairs} -> "
              f"{'None' if out is None else 'HIT'}", flush=True)
        return out
    lc._compute_sim3 = traced_cs

    orig_verify = lc._verify_sim3

    def traced_verify(kf, cand, sc, R, t, pairs):
        out = orig_verify(kf, cand, sc, R, t, pairs)
        print(f"  [verify] kf={kf} cand={cand} s={sc:.4f} "
              f"ransac_pairs={len(pairs[0])} -> "
              f"{'ACCEPT' if out else 'REJECT'}", flush=True)
        return out
    lc._verify_sim3 = traced_verify

    orig_srch = LC._verify_search_refine

    def traced_srch(lm, feat, T0, cam, bf, bounds, st):
        T1, assign, inlier, n_inl, rng_, dm = orig_srch(
            lm, feat, T0, cam, bf, bounds, st)
        inl = np.asarray(inlier)
        dmn = np.asarray(dm)
        close = int(np.sum(inl & (dmn <= 20.0)))
        print(f"    [search] matched={int((np.asarray(assign) >= 0).sum())} "
              f"inliers={int(np.asarray(n_inl))} close={close}", flush=True)
        return T1, assign, inlier, n_inl, rng_, dm
    LC._verify_search_refine = traced_srch

    # ---- run -------------------------------------------------------------
    n_frames = 200
    tracked = 0
    for i, (ts, T_cw, left, right) in enumerate(render_sequence(
            world, loop_trajectory(n_frames, radius=7.0, fps=20.0),
            patch=17)):
        frame = detector.detect(left, i, ts)
        right_feats = detector.detect(right, i + 10_000_000, ts)
        pre.stereo_match(frame, right_feats)
        frame.gt_pose_cw = T_cw
        system.process_frame(frame)
        if frame.pose_cw is not None:
            tracked += 1

    print(f"tracked={tracked}/{n_frames} "
          f"loops_closed={lc.n_loops_closed} "
          f"n_kf={smap.n_keyframes} n_pts={smap.n_points}")
    rmse, _, n = system.ate_against_gt(with_scale=False)
    print(f"ate={rmse:.4f} over {n}")
    from snakeslam_tpu.map.serialization import save_map

    save_map(smap, "/tmp/rendered_loop_map.npz")
    print("map saved to /tmp/rendered_loop_map.npz")


if __name__ == "__main__":
    main()
