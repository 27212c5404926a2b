"""Probe the loop verification gates on the synthetic drift test scenario."""
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
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import snakeslam_tpu.loop.loop_closing as LC


def main():
    from test_loop_reloc import _run_circle
    from snakeslam_tpu.core import lie
    from snakeslam_tpu.map.slam_map import transform_pose_cw
    import jax.numpy as jnp

    system, frames = _run_circle()
    smap = system.map
    lc = system.loop_closing
    kfs = [int(k) for k in smap.valid_keyframes()]
    new_side = set(kfs[-3:])

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

    xi_d = np.array([0.25, -0.1, 0.15, 0.0, 0.03, 0.01, 0.0])
    D = np.asarray(lie.sim3_exp(jnp.asarray(xi_d)))
    s_d = float(np.asarray(lie.sim3_scale(jnp.asarray(D))))
    R_d = D[:3, :3] / s_d
    t_d = D[:3, 3]
    for k in new_side:
        smap.kf_pose[k] = transform_pose_cw(smap.kf_pose[k], s_d, R_d, t_d)
    for pt in smap.valid_points():
        okfs, _ = smap.point_observations(int(pt))
        if len(okfs) and all(k in new_side for k in okfs):
            smap.pt_pos[pt] = s_d * (R_d @ smap.pt_pos[pt]) + t_d
    smap.state += 1

    lc.gba = None
    for k in kfs:
        system.database.add(k)
    lc.last_loop_kf = -10**9
    lc.prev_candidates = set()
    lc.consistency_count = 0

    # instrument retrieval + RANSAC
    db = system.database
    orig_fs = db._filtered_scores

    def traced_fs(v, words, active):
        ids, scores = orig_fs(v, words, active)
        # reference dump: plain min-score scoring over all active
        act_ids = np.nonzero(active)[0]
        plain = 1.0 - 0.5 * np.abs(v[None] - db.vectors[act_ids]).sum(axis=-1)
        order = np.argsort(-plain)[:8]
        counts = db._shared_word_counts(words)
        counts_m = counts.copy()
        counts_m[~active] = 0
        print(f"  [db] survivors={len(ids)} "
              f"ids={ids[:6]} scores={np.round(scores[:6], 3)}\n"
              f"       plain: {list(zip(act_ids[order], np.round(plain[order], 3)))}\n"
              f"       counts: {list(zip(act_ids[order], counts_m[act_ids[order]]))} "
              f"max={counts_m.max()} nwords_q={len(np.unique(words))}",
              flush=True)
        return ids, scores
    db._filtered_scores = traced_fs

    orig_cs = lc._compute_sim3

    def traced_cs(kf, cand):
        out = orig_cs(kf, cand)
        print(f"  [sim3] kf={kf} cand={cand} -> "
              f"{'None' if out is None else 'HIT'}", flush=True)
        return out
    lc._compute_sim3 = traced_cs

    # instrument the verification
    orig_verify = lc._verify_sim3

    def traced_verify(kf, cand, s, R, t, pairs):
        print(f"[verify] kf={kf} cand={cand} s={s:.4f} "
              f"ransac_pairs={len(pairs[0])}", flush=True)
        out = orig_verify(kf, cand, s, R, t, pairs)
        print(f"[verify] -> {'ACCEPT' if out else 'REJECT'}", flush=True)
        return out
    lc._verify_sim3 = traced_verify

    orig_srch = LC._verify_search_refine

    def traced_srch(lm, feat, T0, cam, bf, bounds, st):
        T1, assign, inlier, n_inl, rng, dm = orig_srch(
            lm, feat, T0, cam, bf, bounds, st)
        print(f"  [search] matched={int((np.asarray(assign) >= 0).sum())} "
              f"inliers={int(np.asarray(n_inl))}", flush=True)
        return T1, assign, inlier, n_inl, rng, dm
    LC._verify_search_refine = traced_srch

    ordered = sorted(new_side, key=lambda k: smap.kf_frame_id[k])
    for k in ordered:
        lc.process(k)
    print(f"loops_closed={lc.n_loops_closed}")


if __name__ == "__main__":
    main()
