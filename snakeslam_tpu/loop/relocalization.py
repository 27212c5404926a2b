"""Relocalization: BoW candidate retrieval + PnP recovery after tracking loss.

Mirrors the reference's try_localize path (reference: Snake/Tracking/
TrackingCoarse.cpp:514-539 — BoW keyframe-database candidates, descriptor
matching, P3P RANSAC, robust pose refinement).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from snakeslam_tpu.core.camera import Pinhole
from snakeslam_tpu.loop.keyframe_database import KeyframeDatabase
from snakeslam_tpu.map.slam_map import FrameData, SlamMap
from snakeslam_tpu.ops.descriptors import unpack_bits_np
from snakeslam_tpu.ops.matching import knn2_ratio_match_np
from snakeslam_tpu.ops.pose_solver import pnp_refine_np
from snakeslam_tpu.system.settings import Settings

MIN_RELOC_INLIERS = 30


class Relocalizer:
    def __init__(self, settings: Settings, smap: SlamMap,
                 database: KeyframeDatabase):
        self.s = settings
        self.map = smap
        self.db = database
        self.cam = Pinhole.create(settings.fx, settings.fy, settings.cx,
                                  settings.cy)
        self.bf = jnp.float32(settings.bf)
        self.key = jax.random.PRNGKey(settings.random_seed + 13)

    def try_relocalize(self, frame: FrameData) -> bool:
        """On success fills frame.pose_cw + frame.matches and returns True."""
        smap = self.map
        ids, scores = self.db.detect_relocalization_candidates(
            unpack_bits_np(frame.descriptors), top_n=3
        )
        frame_bits = unpack_bits_np(frame.descriptors)
        for cand in ids:
            cand = int(cand)
            if not smap.kf_valid[cand]:
                continue
            n = int(smap.kf_n_feat[cand])
            feats = np.nonzero(smap.kf_obs[cand, :n] >= 0)[0]
            pts = smap.kf_obs[cand, feats]
            ok = smap.pt_valid[pts]
            pts = pts[ok]
            if len(pts) < MIN_RELOC_INLIERS:
                continue
            idx, dist = knn2_ratio_match_np(
                frame_bits, smap.pt_bits[pts],
                ratio=0.75, max_dist=50,
            )
            sel = idx >= 0
            if sel.sum() < MIN_RELOC_INLIERS:
                continue
            # PnP on the 2D-3D matches (shape-bucketed: attempt counts
            # vary per candidate, padding shares one compile)
            obs_pts = smap.pt_pos[pts[idx[sel]]]
            obs_uv = frame.uv[sel]
            self.key, sub = jax.random.split(self.key)
            n0, T, inlier, n_inl = pnp_refine_np(
                obs_pts, obs_uv, self.cam, self.bf, sub, n_hypotheses=512)
            if n0 < MIN_RELOC_INLIERS // 2:
                continue
            if n_inl < MIN_RELOC_INLIERS:
                continue
            frame.pose_cw = np.asarray(T, dtype=np.float64)
            matches = np.full(frame.n, -1, dtype=np.int64)
            sel_idx = np.nonzero(sel)[0]
            matches[sel_idx[inlier]] = pts[idx[sel]][inlier]
            frame.matches = matches
            frame.outlier = np.zeros(frame.n, dtype=bool)
            frame.ref_kf = cand
            frame.capture_rel(self.map.kf_pose[cand],
                              self.map.kf_frame_id[cand])
            return True
        return False
