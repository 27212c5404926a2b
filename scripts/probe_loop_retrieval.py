"""Offline retrieval dissection on the saved rendered-loop map.

Loads /tmp/rendered_loop_map.npz (written by debug_rendered_loop.py),
rebuilds the BoW database, and for the last revisit keyframes answers:
which old keyframes are geometrically TRUE loop candidates, and at which
retrieval stage (exclusion / sharing-word ratio / score ratio / min-score
/ group accumulation) they die.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from snakeslam_tpu.loop.keyframe_database import (KeyframeDatabase,
                                                  SCORE_RATIO,
                                                  SHARING_WORD_RATIO)
from snakeslam_tpu.map.serialization import load_map
from snakeslam_tpu.ops import bow as BOW

VOC = os.path.join(os.path.dirname(__file__), "..", "snakeslam_tpu",
                   "data", "orbvoc_synth.npz")


def main():
    smap = load_map("/tmp/rendered_loop_map.npz")
    voc = BOW.load_vocabulary_cached(VOC)
    db = KeyframeDatabase(voc, smap)
    kfs = [int(k) for k in smap.valid_keyframes()]
    for k in kfs:
        db.add(k)
    seq = {k: i for i, k in enumerate(kfs)}

    # camera centers + viewing dirs
    centers, dirs = {}, {}
    for k in kfs:
        T = smap.kf_pose[k]
        centers[k] = -T[:3, :3].T @ T[:3, 3]
        dirs[k] = T[:3, :3].T @ np.array([0.0, 0.0, 1.0])

    for q in kfs[-8:]:
        sq = seq[q]
        # geometric truth: old KFs (seq gap > 30) within 1.5 m and viewing
        # the same direction (cos > 0.7)
        true_c = [k for k in kfs
                  if sq - seq[k] > 30
                  and np.linalg.norm(centers[k] - centers[q]) < 2.0
                  and dirs[k] @ dirs[q] > 0.7]
        cov, _ = smap.covisible_keyframes(q, min_weight=1)
        cov = set(int(c) for c in cov)
        too_recent = {k for k in kfs if sq - seq[k] < 10}
        exclude = cov | {q} | too_recent

        v = db.vectors[q]
        words = db.words[q]
        active = db.present & smap.kf_valid[: len(db.present)]
        active = active.copy()
        active[list(exclude)] = False
        counts = db._shared_word_counts(words)
        counts_m = counts.copy()
        counts_m[~active] = 0
        max_common = int(counts_m.max())
        act_ids = np.nonzero(active)[0]
        plain = 1.0 - 0.5 * np.abs(
            v[None] - db.vectors[act_ids]).sum(axis=-1)
        order = np.argsort(-plain)

        # covisible-group min score (what _detect computes)
        covq, _ = smap.covisible_keyframes(q, min_weight=15)
        covp = [c for c in covq if db.present[c]]
        cs = 1.0 - 0.5 * np.abs(v[None] - db.vectors[covp]).sum(axis=-1)
        min_score = max(float(cs.min()) * 0.8, 0.01)

        print(f"\n=== q={q} seq={sq} true={true_c} "
              f"(excluded-as-covisible: {sorted(set(true_c) & cov)})")
        print(f"    min_score={min_score:.4f} max_common={max_common} "
              f"word_th={SHARING_WORD_RATIO * max_common:.1f}")
        top = [(int(act_ids[o]), round(float(plain[o]), 3),
                int(counts_m[act_ids[o]])) for o in order[:8]]
        print(f"    top-plain (id, score, shared_words): {top}")
        for k in true_c[:6]:
            if k not in act_ids:
                why = "COVISIBLE-EXCLUDED" if k in cov else (
                    "TOO-RECENT" if k in too_recent else "not-present")
                print(f"    true {k}: {why}")
                continue
            i = np.nonzero(act_ids == k)[0][0]
            sc = float(plain[i])
            cw = int(counts_m[k])
            stages = []
            if cw < SHARING_WORD_RATIO * max_common:
                stages.append(
                    f"WORD-RATIO (has {cw} < {SHARING_WORD_RATIO*max_common:.0f})")
            best = float(plain.max())
            if sc < SCORE_RATIO * best:
                stages.append(
                    f"SCORE-RATIO ({sc:.3f} < {SCORE_RATIO*best:.3f})")
            if sc < min_score:
                stages.append(f"MIN-SCORE ({sc:.3f} < {min_score:.3f})")
            rank = int(np.nonzero(order == i)[0][0])
            print(f"    true {k}: plain={sc:.3f} rank={rank} "
                  f"shared={cw} kills={stages or 'SURVIVES FILTERS'}")
        ids, scores = db.detect_loop_candidates(
            q, min_score, top_n=5, extra_exclude=too_recent)
        print(f"    detect_loop_candidates -> {list(ids)} "
              f"{np.round(scores, 3)}")


if __name__ == "__main__":
    main()
