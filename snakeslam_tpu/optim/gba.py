"""Global bundle adjustment + outlier removal over the whole map.

Host side of the reference's GlobalBundleAdjustment (reference:
Snake/Optimizer/GlobalBundleAdjustment.cpp): FullBA holds the latest
keyframe constant so asynchronous tracking survives (:376-378), PointBA
optimizes points only (:103-123), and Map::removeOutliers erases
high-residual observations (Snake/Map/Map.cpp:486-501).

Shapes are bucketed to powers of two so the jitted solver recompiles only
when the map crosses a size bucket.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from snakeslam_tpu.core.camera import Pinhole
from snakeslam_tpu.core.pyramid import ScalePyramid
from snakeslam_tpu.map.slam_map import MAX_OBS, SlamMap
from snakeslam_tpu.ops import ba as BA
from snakeslam_tpu.system.settings import Settings

F32 = np.float32


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class GlobalBA:
    def __init__(self, settings: Settings, smap: SlamMap):
        self.s = settings
        self.map = smap
        self.cam = Pinhole.create(settings.fx, settings.fy, settings.cx,
                                  settings.cy)
        self.bf = jnp.float32(settings.bf)
        self.pyramid = ScalePyramid.create(settings.fd_levels,
                                           settings.fd_scale_factor)

    # ------------------------------------------------------------------

    def pack_full(self, obs_slots: int = 16):
        smap = self.map
        kfs = smap.valid_keyframes()
        kfs = kfs[np.argsort(smap.kf_frame_id[kfs])]
        pts = smap.valid_points()
        C = _bucket(len(kfs))
        P = _bucket(len(pts), minimum=256)
        M = obs_slots

        cam_slot = {int(k): i for i, k in enumerate(kfs)}
        cam_pose = np.tile(np.eye(4, dtype=F32), (C, 1, 1))
        cam_fixed = np.ones(C, dtype=bool)
        cam_valid = np.zeros(C, dtype=bool)
        cam_pose[: len(kfs)] = smap.kf_pose[kfs]
        cam_valid[: len(kfs)] = True
        cam_fixed[: len(kfs)] = False
        # gauge: first KF fixed; latest KF constant (GBA:376-378)
        cam_fixed[0] = True
        cam_fixed[len(kfs) - 1] = True

        points = np.zeros((P, 3), dtype=F32)
        point_valid = np.zeros(P, dtype=bool)
        points[: len(pts)] = smap.pt_pos[pts]
        point_valid[: len(pts)] = True

        obs_cam = np.full((P, M), -1, dtype=np.int32)
        obs_uv = np.zeros((P, M, 2), dtype=F32)
        obs_right = np.full((P, M), -1.0, dtype=F32)
        obs_weight = np.ones((P, M), dtype=F32)
        obs_valid = np.zeros((P, M), dtype=bool)
        obs_feat = np.full((P, M), -1, dtype=np.int32)

        inv_scale = self.pyramid.inv_scales
        # vectorized packing from the bounded per-point obs tables
        src_kf = smap.pt_obs_kf[pts][:, :MAX_OBS]
        src_feat = smap.pt_obs_feat[pts][:, :MAX_OBS]
        for pi in range(len(pts)):
            m = 0
            for s in range(MAX_OBS):
                k = src_kf[pi, s]
                if k < 0 or m >= M:
                    continue
                slot = cam_slot.get(int(k))
                if slot is None:
                    continue
                f = src_feat[pi, s]
                obs_cam[pi, m] = slot
                obs_uv[pi, m] = smap.kf_feat_uv[k, f]
                obs_right[pi, m] = smap.kf_feat_right[k, f]
                obs_weight[pi, m] = inv_scale[
                    min(int(smap.kf_feat_octave[k, f]), len(inv_scale) - 1)
                ]
                obs_valid[pi, m] = True
                obs_feat[pi, m] = f
                m += 1

        problem = BA.BAProblem(
            cam_pose=jnp.asarray(cam_pose),
            cam_fixed=jnp.asarray(cam_fixed),
            cam_valid=jnp.asarray(cam_valid),
            points=jnp.asarray(points),
            point_valid=jnp.asarray(point_valid),
            obs_cam=jnp.asarray(obs_cam),
            obs_uv=jnp.asarray(obs_uv),
            obs_right=jnp.asarray(obs_right),
            obs_weight=jnp.asarray(obs_weight),
            obs_valid=jnp.asarray(obs_valid),
            **BA.empty_rpc(),
        )
        aux = dict(kfs=kfs, pts=pts, obs_cam=obs_cam, obs_feat=obs_feat,
                   obs_valid=obs_valid)
        return problem, aux

    # ------------------------------------------------------------------

    def full_ba(self, iterations: int = 5):
        smap = self.map
        if smap.n_keyframes < 2 or smap.n_points < 20:
            return
        problem, aux = self.pack_full()
        cam_pose, points, cost = BA.solve_ba(
            problem, self.cam, self.bf, iterations=iterations
        )
        cam_pose = np.asarray(cam_pose, dtype=np.float64)
        points = np.asarray(points, dtype=np.float64)
        smap.kf_pose[aux["kfs"]] = cam_pose[: len(aux["kfs"])]
        smap.pt_pos[aux["pts"]] = points[: len(aux["pts"])]
        smap.state += 1
        return float(cost)

    def point_ba(self, iterations: int = 4):
        smap = self.map
        if smap.n_points < 10:
            return
        problem, aux = self.pack_full()
        points = np.asarray(
            BA.solve_point_only(problem, self.cam, self.bf,
                                iterations=iterations),
            dtype=np.float64,
        )
        smap.pt_pos[aux["pts"]] = points[: len(aux["pts"])]
        smap.state += 1

    def remove_outliers(self, factor: float = 0.75):
        """Erase observations with chi2 above factor * threshold^2
        (System.cpp:202-205 uses 0.75 * th^2 before the final BA)."""
        smap = self.map
        problem, aux = self.pack_full()
        out = np.asarray(BA.classify_outliers(
            problem, self.cam, self.bf, problem.cam_pose, problem.points,
            chi2_mono=factor * 2.1**2, chi2_stereo=factor * 2.3**2,
        ))
        removed = 0
        for pi, mi in zip(*np.nonzero(out & aux["obs_valid"])):
            slot = aux["obs_cam"][pi, mi]
            k = int(aux["kfs"][slot])
            f = int(aux["obs_feat"][pi, mi])
            smap.remove_observation(k, f)
            pt = int(aux["pts"][pi])
            if smap.pt_n_obs[pt] < 2:
                smap.erase_point(pt)
            removed += 1
        smap.state += 1
        return removed
