"""Deferred mapping: late refinement of stabilized keyframes.

Replacement for the reference's DeferredMapper (reference:
Snake/Optimizer/DeferredMapper.{h,cpp}, queue delay 9) — once a keyframe's
pose has stabilized:
  * Relink (:39-165): move each observation to a better-fitting keypoint
    within 0.8 px of the reprojection, and drop observations with
    reprojection error above 2.1 px (scale-weighted).
  * MapSearch (:167-178): stricter re-fuse against older keyframes.
  * Retriangulate (:180-225): re-run triangulation with tightened gates
    (0.8x reprojection threshold, 1.2 px epipolar), then cull newly created
    points left with <= 2 observations.
"""

from __future__ import annotations

import numpy as np

from snakeslam_tpu.core.pyramid import ScalePyramid
from snakeslam_tpu.map.slam_map import SlamMap
from snakeslam_tpu.system.settings import Settings

RELINK_RADIUS = 0.8
OUTLIER_ERROR = 2.1


class DeferredMapper:
    def __init__(self, settings: Settings, smap: SlamMap, map_searcher=None,
                 local_mapper=None):
        self.s = settings
        self.map = smap
        self.map_searcher = map_searcher
        self.local_mapper = local_mapper
        self.pyramid = ScalePyramid.create(settings.fd_levels,
                                           settings.fd_scale_factor)
        self.n_relinked = 0
        self.n_removed = 0

    def add(self, kf: int):
        self.process(kf)

    # ------------------------------------------------------------------

    def process(self, kf: int):
        if not self.map.kf_valid[kf]:
            return
        self.relink(kf)
        if self.map_searcher is not None:
            self.map_searcher.process(kf)
        self.retriangulate(kf)

    # ------------------------------------------------------------------

    def relink(self, kf: int):
        """Reproject every observed point; relink to the closest keypoint
        within RELINK_RADIUS, drop residuals above OUTLIER_ERROR px."""
        smap = self.map
        n = int(smap.kf_n_feat[kf])
        feats = np.nonzero(smap.kf_obs[kf, :n] >= 0)[0]
        if len(feats) == 0:
            return
        pts = smap.kf_obs[kf, feats]
        T = smap.kf_pose[kf]
        pc = smap.pt_pos[pts] @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        ok = z > 1e-4
        u = self.s.fx * pc[:, 0] / np.maximum(z, 1e-4) + self.s.cx
        v = self.s.fy * pc[:, 1] / np.maximum(z, 1e-4) + self.s.cy
        uv_all = smap.kf_feat_uv[kf, :n]
        scales = self.pyramid.scales
        for i, (f, pt) in enumerate(zip(feats, pts)):
            if not ok[i] or not smap.pt_valid[pt]:
                smap.remove_observation(kf, int(f))
                self.n_removed += 1
                continue
            proj = np.array([u[i], v[i]])
            err = np.linalg.norm(uv_all[f] - proj)
            octv = min(int(smap.kf_feat_octave[kf, f]), len(scales) - 1)
            if err > OUTLIER_ERROR * scales[octv]:
                smap.remove_observation(kf, int(f))
                pt_i = int(pt)
                if smap.pt_n_obs[pt_i] < 2:
                    smap.erase_point(pt_i)
                self.n_removed += 1
                continue
            # a closer keypoint within the relink radius takes over
            d = np.linalg.norm(uv_all - proj, axis=1)
            d[f] = np.inf
            best = int(np.argmin(d))
            if d[best] < RELINK_RADIUS and d[best] < err \
                    and smap.kf_obs[kf, best] < 0:
                smap.remove_observation(kf, int(f))
                smap.add_observation(kf, best, int(pt))
                self.n_relinked += 1
        smap.state += 1

    # ------------------------------------------------------------------

    def retriangulate(self, kf: int):
        """Re-run triangulation with tightened gates; cull weak newcomers
        (Retriangulate, :180-225)."""
        if self.local_mapper is None:
            return
        before = {int(p) for p in self.map.keyframe_points(kf)}
        self.local_mapper._triangulate_new_points(
            kf, num_neighbors=10,
            feature_distance=40, epipolar_distance=1.2,
            error_mono=0.8 * OUTLIER_ERROR,
        )
        for pt in self.map.keyframe_points(kf):
            pt = int(pt)
            if pt not in before and self.map.pt_n_obs[pt] <= 2:
                # newly created and weakly observed: cull
                self.map.erase_point(pt)
