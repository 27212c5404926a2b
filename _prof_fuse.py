import time, collections, numpy as np, jax, jax.numpy as jnp
import bench
from snakeslam_tpu.mapping import fusion as FU
from snakeslam_tpu.ops import matching as M
from snakeslam_tpu.tracking.staging import kf_features_cached

T = collections.defaultdict(float); C = collections.defaultdict(int)
def tick(key, t0):
    T[key] += time.perf_counter()-t0; C[key]+=1
    return time.perf_counter()

def process(self, kf, n_neighbors=15):
    smap = self.map
    t0=time.perf_counter()
    ids, w = smap.covisible_keyframes(kf, min_weight=1)
    neighbors = [int(k) for k in ids[:n_neighbors]]
    if not neighbors: return 0
    fused = 0
    mirror = smap.device_mirror()
    st = M.ScaleTables(scales=self.scales, log_scale_factor=self.log_sf, levels=int(self.scales.shape[0]))
    kf_pts = smap.keyframe_points(kf)
    t0=tick("covis", t0)
    fp_fwd = ids_f = None
    if len(kf_pts):
        padded = neighbors + [neighbors[-1]]*(n_neighbors-len(neighbors))
        lm_f, ids_f = mirror.gather(kf_pts, self.s.local_map_slots)
        t0=tick("gather_f", t0)
        feats = [kf_features_cached(smap, nb, self.s.feature_slots) for nb in padded]
        t0=tick("feats", t0)
        feats_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *feats)
        t0=tick("stack", t0)
        poses = jnp.asarray(smap.kf_pose[padded], dtype=jnp.float32)
        fp_fwd = FU._fuse_search_batch(lm_f, feats_stack, poses, self.cam, self.bf,
            jnp.asarray(self.bounds, dtype=jnp.float32), self.scales, self.log_sf, int(self.scales.shape[0]))
        t0=tick("disp_f", t0)
    nb_pts = np.unique(np.concatenate([smap.keyframe_points(nb) for nb in neighbors]))
    nb_pts = nb_pts[smap.pt_valid[nb_pts]]
    t0=tick("nbpts", t0)
    fp_bwd = ids_b = None
    if len(nb_pts):
        lm_b, ids_b = mirror.gather(nb_pts, self.s.local_map_slots)
        feats_kf = kf_features_cached(smap, kf, self.s.feature_slots)
        out = M.search_by_projection_fine(lm_b, feats_kf, jnp.asarray(smap.kf_pose[kf], dtype=jnp.float32),
            self.cam, self.bf, self.bounds, st, feat_free=feats_kf.valid, th=1.0, ratio=0.9)
        fp_bwd = out["feat_point"]
        t0=tick("disp_b", t0)
    if fp_fwd is not None:
        fp_all = np.asarray(fp_fwd)
        t0=tick("block_f", t0)
        for bi, nb in enumerate(neighbors):
            fused += self._commit_fuse(fp_all[bi], ids_f, nb)
        t0=tick("commit_f", t0)
    if fp_bwd is not None:
        fused += self._commit_fuse(np.asarray(fp_bwd), ids_b, kf)
        t0=tick("block+commit_b", t0)
    smap.state += 1
    return fused
FU.MapSearcher.process = process

from snakeslam_tpu.frontend.synthetic_source import apply_world_to_settings, synthetic_frames
from snakeslam_tpu.system.settings import InputType, Settings
from snakeslam_tpu.system.slam import SlamSystem
from snakeslam_tpu.utils.synthetic import SyntheticWorld, orbit_trajectory
from snakeslam_tpu.tracking.windowed import WindowedRunner

def build(seed, count):
    settings = Settings(); settings.input_type = InputType.Stereo
    settings.enable_imu = False; settings.feature_slots = 1024
    settings.local_map_slots = 4096; settings.lba_cam_slots = 32
    settings.lba_point_slots = 8192; settings.lba_obs_slots = 8
    settings.th_depth = 25.0
    world = SyntheticWorld(n_points=6000, seed=seed)
    apply_world_to_settings(world, settings)
    system = SlamSystem(settings)
    frames = list(synthetic_frames(world, orbit_trajectory(count, radius=7.0, arc=1.2*count/400.0, fps=200.0), settings, noise_px=0.3))
    return system, frames

system, frames = build(123, 48)
for f in frames: f.timestamp = f.frame_id/10.0
WindowedRunner(system, window=64, two_stage=True).run(frames)
for d in (T, C): d.clear()
system, frames = build(7, 400)
runner = WindowedRunner(system, window=64, two_stage=True)
t0 = time.perf_counter(); runner.run(frames); wall = time.perf_counter()-t0
print(f"wall {wall:.2f}s")
for k in T: print(f"{k:16s} {T[k]*1000:8.1f}ms n={C[k]} avg={T[k]/max(C[k],1)*1000:7.1f}ms")
