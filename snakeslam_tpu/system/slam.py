"""SlamSystem: module construction, the run loop, and end-of-run passes.

Mirrors the reference's System (reference: Snake/System/System.{h,cpp}):
constructs the module graph (System.cpp:49-107), drives input -> tracking,
then runs the final global-BA passes and outlier removal (System.cpp:150-260)
and writes TUM trajectories (System.cpp:529-590).
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from snakeslam_tpu.core import trajectory as traj
from snakeslam_tpu.map.slam_map import FrameData, SlamMap
from snakeslam_tpu.mapping.local_mapping import LocalMapper
from snakeslam_tpu.optim.lba import LocalBA
from snakeslam_tpu.system.settings import Settings
from snakeslam_tpu.system.stats import PerformanceStats
from snakeslam_tpu.tracking.tracker import Tracker, TrackingState


class SlamSystem:
    def __init__(self, settings: Settings):
        self.s = settings
        self.map = SlamMap(settings.max_keyframes, settings.max_points,
                           settings.feature_slots)
        self.imu_solver = None
        if settings.enable_imu:
            from snakeslam_tpu.imu.state_solver import ImuStateSolver
            from snakeslam_tpu.optim.gba import GlobalBA

            self.imu_solver = ImuStateSolver(
                settings, self.map, gba=GlobalBA(settings, self.map)
            )
        self.lba = LocalBA(settings, self.map, imu_solver=self.imu_solver)

        # BoW vocabulary + keyframe database + loop closing + relocalization
        # (reference: System.cpp:44-46 vocabulary load; modules :49-107)
        from pathlib import Path

        from snakeslam_tpu.loop.keyframe_database import KeyframeDatabase
        from snakeslam_tpu.loop.loop_closing import LoopClosing
        from snakeslam_tpu.loop.relocalization import Relocalizer
        from snakeslam_tpu.ops import bow as BOW
        from snakeslam_tpu.optim.gba import GlobalBA

        voc_path = Path(settings.voc_file)
        if not voc_path.exists():
            # shipped default: trained on ORB descriptors extracted from
            # rendered synthetic scenes (scripts/train_vocab.py) — real
            # descriptor statistics, the analog of the reference's ORBvoc
            # load (System.cpp:44)
            shipped = (Path(__file__).resolve().parent.parent / "data"
                       / "orbvoc_synth.npz")
            if shipped.exists():
                voc_path = shipped
        if voc_path.exists() and voc_path.suffix == ".npz":
            self.vocabulary = BOW.load_vocabulary_cached(voc_path)
        else:
            self.vocabulary = BOW.random_vocabulary_cached(
                settings.random_seed)
        self.database = KeyframeDatabase(self.vocabulary, self.map)
        self.loop_closing = LoopClosing(
            settings, self.map, self.database,
            gba=GlobalBA(settings, self.map),
        )
        self.relocalizer = Relocalizer(settings, self.map, self.database)

        # simplification + deferred mapping behind delayed queues
        # (reference delays: simplification 8, deferred mapper 9 —
        # Simplification.cpp:16-18, DeferredMapper.cpp:15-16)
        from snakeslam_tpu.optim.deferred_mapper import DeferredMapper
        from snakeslam_tpu.optim.simplification import Simplification
        from snakeslam_tpu.system.queues import DelayedQueue

        self.simplification = Simplification(settings, self.map,
                                             imu_solver=self.imu_solver)
        self.deferred_mapper = DeferredMapper(settings, self.map)
        self._simp_queue = DelayedQueue(self.simplification.add, delay=8,
                                        parallel=settings.async_mode,
                                        name="simplification")
        self._deferred_queue = DelayedQueue(self.deferred_mapper.add, delay=9,
                                            parallel=settings.async_mode,
                                            name="deferred")

        class _QueueBackend:
            def __init__(self, queue):
                self.queue = queue

            def add(self, kf):
                self.queue.add(kf)
                self.queue.update(kf)

        lba_backend = self.lba
        if settings.async_lba:
            from snakeslam_tpu.system.pipeline import AsyncLBA

            self._async_lba = AsyncLBA(self.lba)
            lba_backend = self._async_lba
        else:
            self._async_lba = None

        self.local_mapper = LocalMapper(
            settings, self.map, lba=lba_backend,
            imu_solver=self.imu_solver,
            backends=[self.loop_closing,
                      _QueueBackend(self._simp_queue),
                      _QueueBackend(self._deferred_queue)],
        )
        self.deferred_mapper.map_searcher = self.local_mapper.map_searcher
        self.deferred_mapper.local_mapper = self.local_mapper
        self.tracker = Tracker(settings, self.map,
                               local_mapper=self.local_mapper,
                               imu_solver=self.imu_solver,
                               relocalizer=self.relocalizer)
        self.stats = PerformanceStats()
        self.n_frames = 0
        self.frame_listeners: list = []   # per-frame viewer stream hooks

    # ------------------------------------------------------------------

    def process_frame(self, frame: FrameData):
        with self.stats.timer("Tracking"):
            with self.map.lock:
                st = self.tracker.process_frame(frame)
        self.n_frames += 1
        for cb in self.frame_listeners:
            # viewer-frame stream (the reference pushes ViewerFrames from
            # the tracking thread, Tracking.cpp:110-118)
            cb(frame)
        return st

    def run(self, frames):
        """Drive a frame iterable through the pipeline (dataset mode).
        async_mode runs the front-end stages on a producer thread
        (README.md:61-65 deployment semantics)."""
        t0 = time.perf_counter()
        if self.s.async_mode:
            from snakeslam_tpu.system.pipeline import AsyncPipeline

            AsyncPipeline(self, frames).run()
        else:
            for frame in frames:
                self.process_frame(frame)
        if self._async_lba is not None:
            self._async_lba.join()
        wall = time.perf_counter() - t0
        self.finalize()
        return wall

    # ------------------------------------------------------------------

    def finalize(self, gba_iterations: int = 5, vi_alternations: int = 10):
        """End-of-run passes (System.cpp:186-215): full BA (+ the final
        visual-inertial alternation IterateBaImu when IMU is active,
        System.cpp:190-200) + outlier removal + another BA round."""
        from snakeslam_tpu.optim.gba import GlobalBA

        # end-of-run bad-section mitigation (System.cpp:167-184): the
        # trailing ~30 frames never received the usual back-end polish, so
        # raise their keyframes' culling bias past the force threshold and
        # hand them to simplification before the final BA passes
        valid = self.map.valid_keyframes()
        if len(valid):
            last_fid = int(self.map.kf_frame_id[valid].max())
            # guard (beyond the reference): in a short run EVERY keyframe
            # is "trailing" and force-culling them all guts the map — only
            # mitigate when a non-trailing backbone remains
            n_backbone = int((self.map.kf_frame_id[valid]
                              <= last_fid - 30).sum())
            kf = valid[np.argmax(self.map.kf_frame_id[valid])]
            while (n_backbone >= 3 and kf >= 0
                   and self.map.kf_frame_id[kf] > last_fid - 30):
                self.map.kf_cull_factor[kf] = 5.0
                self._simp_queue.add(int(kf))
                kf = int(self.map.kf_prev[kf])

        # drain the delayed back-end queues (ForceCleanQueue analog,
        # System.cpp:167-184)
        self._simp_queue.force_clean()
        self._deferred_queue.force_clean()
        if self.map.n_keyframes >= 2:
            gba = GlobalBA(self.s, self.map, imu_solver=self.imu_solver)
            gba.full_ba(iterations=gba_iterations)
            if (self.imu_solver is not None
                    and self.imu_solver.gravity_initialized):
                # final decoupled-VI alternation (IterateBaImu,
                # ImuStateSolver.cpp:469-484)
                old_gba, self.imu_solver.gba = self.imu_solver.gba, gba
                self.imu_solver.iterate_ba_imu(vi_alternations)
                self.imu_solver.gba = old_gba
            else:
                gba.full_ba(iterations=gba_iterations)
            gba.remove_outliers()
            gba.full_ba(iterations=gba_iterations)
            # rematch + pose-only realign of the non-keyframe frames against
            # the final map (System.cpp:208-215: RealignIntermiediateFrames
            # x2 interleaved with RematchIntermiediate)
            gba.realign_intermediate_frames(self.tracker.trajectory)
            gba.rematch_intermediate(self.tracker.trajectory)
            gba.realign_intermediate_frames(self.tracker.trajectory)

    # ------------------------------------------------------------------
    # trajectory export (TUM format, System.cpp:529-590)
    # ------------------------------------------------------------------

    def frame_pose_global(self, f) -> np.ndarray | None:
        """A tracked frame's CURRENT global pose: composed through its
        reference keyframe when possible (reference: Frame.cpp:67-71
        getPoseFromReference; the TUM writers compose the same way,
        System.cpp:529-590) so LBA refinements and loop corrections that
        moved the reference keyframe retroactively correct the frame.
        Falls back to the tracked absolute pose when the reference was
        culled (the reference walks spanning-tree parents there,
        Keyframe.cpp:612-625; culled keyframes' poses stop receiving
        corrections either way)."""
        if f.pose_cw is None:
            return None
        if f.rel_to_ref is None:
            return f.pose_cw
        rel = f.rel_to_ref
        r, rfid = f.ref_kf, f.ref_frame_id
        # culled references: walk the recorded anchor chain so the frame
        # stays in the CURRENT map gauge (a final FullBA can re-gauge the
        # whole map; a stored absolute pose would mix gauges)
        for _ in range(64):
            if (0 <= r < self.map.max_keyframes and self.map.kf_valid[r]
                    and self.map.kf_frame_id[r] == rfid):
                return rel @ self.map.kf_pose[r]
            hop = self.map.erased_kf_rel.get(int(rfid))
            if hop is None:
                return f.pose_cw
            a, afid, arel = hop
            rel = rel @ arel
            r, rfid = a, afid
        return f.pose_cw

    def frame_trajectory(self):
        """(timestamps, positions, quats_wxyz) of all tracked frames, camera
        center in world coordinates."""
        ts, pos, quat = [], [], []
        from snakeslam_tpu.core import lie
        import jax.numpy as jnp

        for f in self.tracker.trajectory:
            pose = self.frame_pose_global(f)
            if pose is None:
                continue
            Twc = np.linalg.inv(pose)
            ts.append(f.timestamp)
            pos.append(Twc[:3, 3])
            q = np.asarray(lie.rotmat_to_quat(jnp.asarray(Twc[:3, :3])))
            quat.append(q)
        return np.array(ts), np.array(pos), np.array(quat)

    def keyframe_trajectory(self):
        from snakeslam_tpu.core import lie
        import jax.numpy as jnp

        ks = self.map.valid_keyframes()
        order = np.argsort(self.map.kf_timestamp[ks])
        ks = ks[order]
        ts, pos, quat = [], [], []
        for k in ks:
            Twc = np.linalg.inv(self.map.kf_pose[k])
            ts.append(self.map.kf_timestamp[k])
            pos.append(Twc[:3, 3])
            quat.append(np.asarray(
                lie.rotmat_to_quat(jnp.asarray(Twc[:3, :3]))
            ))
        return np.array(ts), np.array(pos), np.array(quat)

    def write_trajectories(self, out_dir: str | Path):
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        prefix = self.s.out_file_prefix
        ts, pos, quat = self.frame_trajectory()
        if len(ts):
            traj.write_tum(out_dir / f"{prefix}_frames_ba.tum", ts, pos, quat)
        ts, pos, quat = self.keyframe_trajectory()
        if len(ts):
            traj.write_tum(out_dir / f"{prefix}_keyframes_ba.tum", ts, pos, quat)

    def map_statistics(self) -> str:
        """End-of-run map statistics table (Module.cpp:14-77 parity):
        ATE RMSE Sim3/SE3, scale error, reprojection RMSE, obs density."""
        smap = self.map
        lines = []
        rmse_sim3, scale, n = self.ate_against_gt(with_scale=True)
        rmse_se3, _, _ = self.ate_against_gt(with_scale=False)
        n_obs = int(smap.pt_n_obs[smap.valid_points()].sum())
        n_kf = max(smap.n_keyframes, 1)
        n_pt = max(smap.n_points, 1)
        reproj = smap.reprojection_stats(self.s.fx, self.s.fy,
                                         self.s.cx, self.s.cy)
        lines.append(f"{'Keyframes':<24}{smap.n_keyframes:>12}")
        lines.append(f"{'Map points':<24}{smap.n_points:>12}")
        lines.append(f"{'Observations':<24}{n_obs:>12}")
        lines.append(f"{'Obs / keyframe':<24}{n_obs / n_kf:>12.1f}")
        lines.append(f"{'Obs / point':<24}{n_obs / n_pt:>12.2f}")
        lines.append(f"{'Reprojection RMSE (px)':<24}{reproj:>12.3f}")
        if n:
            lines.append(f"{'ATE RMSE Sim3 (m)':<24}{rmse_sim3:>12.4f}")
            lines.append(f"{'ATE RMSE SE3 (m)':<24}{rmse_se3:>12.4f}")
            lines.append(
                f"{'Scale error (%)':<24}{abs(1 - scale) * 100:>12.2f}"
            )
        return "\n".join(lines)

    def ate_against_gt(self, with_scale: bool = True):
        """ATE vs the ground-truth poses carried by the frames (eval only)."""
        est, gt = [], []
        for f in self.tracker.trajectory:
            pose = self.frame_pose_global(f)
            if pose is None or f.gt_pose_cw is None:
                continue
            est.append(np.linalg.inv(pose)[:3, 3])
            gt.append(np.linalg.inv(f.gt_pose_cw)[:3, 3])
        if len(est) < 3:
            return float("nan"), 1.0, 0
        rmse, scale = traj.ate_rmse(np.array(est), np.array(gt),
                                    with_scale=with_scale)
        return rmse, scale, len(est)
