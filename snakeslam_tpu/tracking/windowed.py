"""Windowed tracking driver: host loop around the window megastep.

Runs steady-state tracking W frames per device round trip (see
models/window_step.py); drops back to the per-frame Tracker path for
initialization, keyframe insertion, failures, and recovery.  This is the
high-throughput deterministic evaluation mode (the reference's
playback_fps=200 setting, README.md:53-60).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from snakeslam_tpu.map.slam_map import FrameData
from snakeslam_tpu.models.window_step import pack_frames_np, window_track
from snakeslam_tpu.system.settings import InputType
from snakeslam_tpu.tracking.tracker import TrackingState


def _rodrigues(w: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def gyro_delta_rotation(omega: np.ndarray, dt: np.ndarray,
                        bg: np.ndarray) -> np.ndarray:
    """Body-frame relative rotation dR = prod exp((w - bg) dt) over the
    frame's gyro samples (host-side; a handful of 3x3 products)."""
    dR = np.eye(3)
    for w, h in zip(omega, dt):
        dR = dR @ _rodrigues((w - bg) * h)
    return dR


class WindowedRunner:
    def __init__(self, system, window: int = 16, two_stage: bool = True):
        self.system = system
        self.tracker = system.tracker
        self.window = window
        self.two_stage = two_stage
        self.n_device_calls = 0
        self.imu_solver = getattr(system, "imu_solver", None)

    def _use_imu(self) -> bool:
        sol = self.imu_solver
        return sol is not None and sol.gyro_initialized

    def _attach_imu_prediction(self, batch):
        """Gyro-predicted camera-frame relative rotation per frame
        (prediction input for the scan; TrackingCoarse.cpp:322-327)."""
        sol = self.imu_solver
        R_cb = sol.R_cb
        for f in batch:
            if getattr(f, "imu_dR_cam", None) is not None:
                continue
            if f.imu_omega is None or not len(f.imu_omega):
                f.imu_dR_cam = np.eye(3)
                continue
            dR = gyro_delta_rotation(f.imu_omega, f.imu_dt, sol.bg)
            f.imu_dR_cam = R_cb @ dR.T @ R_cb.T

    # ------------------------------------------------------------------

    def _decision_scalars(self):
        t = self.tracker
        smap = t.map
        kf = t.last_kf
        kf_pts = smap.keyframe_points(kf)
        min_obs = 2 if smap.n_keyframes <= 2 else 3
        last_kf_matches = max(int((smap.pt_n_obs[kf_pts] >= min_obs).sum()), 1)
        T = smap.kf_pose[kf]
        center = -T[:3, :3].T @ T[:3, 3]
        viewdir = T[:3, :3].T @ np.array([0.0, 0.0, 1.0])
        med = smap.kf_median_depth[kf] or smap.compute_median_depth(kf)
        return dict(
            kfi_target=jnp.float32(t.s.kfi_target_matches),
            last_kf_matches=jnp.float32(last_kf_matches),
            last_kf_time=jnp.float32(smap.kf_timestamp[kf]),
            last_kf_center=jnp.asarray(center, dtype=jnp.float32),
            last_kf_viewdir=jnp.asarray(viewdir, dtype=jnp.float32),
            median_depth=jnp.float32(max(med, 1e-3)),
            is_stereo=jnp.asarray(
                t.s.input_type == InputType.Stereo, dtype=bool
            ),
            th_depth=jnp.float32(t.s.th_depth),
        )

    def _local_map(self):
        t = self.tracker
        lf = t.last_frame
        matched = (lf.matches[lf.matches >= 0]
                   if lf is not None and lf.matches is not None
                   else np.array([], dtype=np.int64))
        if t.map.state == t._fine_cache_state and t._fine_cache[0] is not None:
            return t._fine_cache
        # bucket the snapshot padding (powers of two): the scan's compute
        # scales with the snapshot size, and each bucket compiles once
        uniq = np.unique(matched)
        n_live = int(self.tracker.map.pt_valid.sum())
        bucket = max(1024, self.system.s.local_map_slots // 8)
        while bucket < min(n_live + 256, self.system.s.local_map_slots):
            bucket *= 2
        bucket = min(bucket, self.system.s.local_map_slots)
        lm, ids = t._fine_local_map(uniq, n_slots=bucket)
        if lm is not None:
            t._fine_cache = (lm, ids)
            t._fine_cache_state = t.map.state
        return lm, ids

    # ------------------------------------------------------------------

    def run(self, frames: list[FrameData]) -> int:
        i = 0
        n = len(frames)
        W = self.window
        t = self.tracker
        s = self.system.s
        Ns = s.feature_slots
        while i < n:
            if t.state != TrackingState.OK or t.last_frame is None \
                    or t.last_frame.pose_cw is None:
                t.local_mapper.flush_deferred()
                self.system.process_frame(frames[i])
                i += 1
                continue
            lm, lm_ids = self._local_map()
            if lm is None:
                t.local_mapper.flush_deferred()
                self.system.process_frame(frames[i])
                i += 1
                continue

            batch = frames[i:i + W]
            actual = len(batch)
            use_imu = self._use_imu()
            if use_imu:
                self._attach_imu_prediction(batch)
            while len(batch) < W:  # pad to the compiled width
                batch = batch + [batch[-1]]
            buf = pack_frames_np(batch, Ns)

            def dispatch():
                self.n_device_calls += 1
                return window_track(
                    lm, jnp.asarray(buf),
                    jnp.asarray(t.last_frame.pose_cw, dtype=jnp.float32),
                    jnp.asarray(t.velocity, dtype=jnp.float32),
                    t.cam, t.bf, t.bounds, t.scales, t.log_sf,
                    t.coarse_radius, t.fine_th,
                    **self._decision_scalars(),
                    frames_since_kf0=jnp.int32(
                        int(batch[0].frame_id)
                        - int(t.map.kf_frame_id[t.last_kf])
                    ),
                    n_valid_frames=jnp.int32(actual),
                    n_slots=Ns, two_stage=self.two_stage, use_imu=use_imu,
                )

            fut = dispatch()
            # overlap deferred keyframe back-ends (triangulation, fusion,
            # LBA, loop detection) with the in-flight window scan
            transforms_before = getattr(t.map, "n_transforms", 0)
            t.local_mapper.flush_deferred()
            try:
                packed = np.asarray(fut)
            except jax.errors.JaxRuntimeError:
                # transient device/tunnel failure (e.g. FAILED_PRECONDITION
                # through the remote-TPU link): retry the window once, then
                # fall back to the per-frame path for this frame
                try:
                    packed = np.asarray(dispatch())
                except jax.errors.JaxRuntimeError:
                    self.system.process_frame(frames[i])
                    i += 1
                    continue
            if getattr(t.map, "n_transforms", 0) != transforms_before:
                # a loop correction re-based the map while the window was in
                # flight: its poses live in the old frame — discard and
                # re-track from the per-frame path
                self.system.process_frame(frames[i])
                i += 1
                continue

            stride = 20 + Ns
            P = (len(packed) - W * stride) // 2  # snapshot bucket size
            outs = packed[: W * stride].reshape(W, stride)
            vis_sum = packed[W * stride: W * stride + P]
            fnd_sum = packed[W * stride + P: W * stride + 2 * P]

            consumed = 0
            for w in range(actual):
                row = outs[w]
                stopped_before = row[19] > 0.5
                if stopped_before:
                    break
                ok = row[17] > 0.5
                if not ok:
                    break  # re-run this frame through the full tracker
                frame = batch[w]
                if self.imu_solver is not None:
                    # keep keyframe-edge preintegration windows complete
                    self.imu_solver.add_frame_samples(frame)
                frame.pose_cw = row[:16].reshape(4, 4).astype(np.float64)
                assign = row[20:20 + Ns].astype(np.int64)[: frame.n]
                matches = np.full(frame.n, -1, dtype=np.int64)
                sel = assign >= 0
                matches[sel] = lm_ids[assign[sel]]
                frame.matches = matches
                frame.outlier = np.zeros(frame.n, dtype=bool)
                frame.ref_kf = t.last_kf
                # tracker bookkeeping
                if (t.last_tracked_frame is not None
                        and t.last_tracked_frame.pose_cw is not None):
                    t.velocity = frame.pose_cw @ np.linalg.inv(
                        t.last_tracked_frame.pose_cw
                    )
                t.last_tracked_frame = frame
                t.last_frame = frame
                t.trajectory.append(frame)
                consumed += 1
                need_kf = row[18] > 0.5
                if need_kf:
                    kf = t.local_mapper.insert_keyframe(frame, t.last_kf,
                                                        defer=True)
                    if kf >= 0:
                        t.last_kf = kf
                    break

            # found/visible statistics: per-frame integer counts, matching
            # the reference's per-frame IncreaseVisible/IncreaseFound so the
            # found_ratio < 0.25 cull rule keeps its meaning across windows
            nlm = len(lm_ids)
            np.add.at(t.map.pt_visible, lm_ids,
                      np.rint(vis_sum[:nlm]).astype(t.map.pt_visible.dtype))
            np.add.at(t.map.pt_found, lm_ids,
                      np.rint(fnd_sum[:nlm]).astype(t.map.pt_found.dtype))

            if consumed == 0:
                # first frame of the window failed: full per-frame path
                # (brute-force fallback / loss handling); run any deferred
                # keyframe work first so the map is fully current
                t.local_mapper.flush_deferred()
                self.system.process_frame(frames[i])
                i += 1
            else:
                self.system.n_frames += consumed
                i += consumed
        t.local_mapper.flush_deferred()
        return n
