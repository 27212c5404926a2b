import time, collections, numpy as np
import bench
from snakeslam_tpu.mapping import local_mapping as LM
from snakeslam_tpu.mapping import fusion as FU
from snakeslam_tpu.optim import lba as LBA_mod
from snakeslam_tpu.tracking import windowed as WI

stats = collections.defaultdict(float); counts = collections.defaultdict(int)
def wrap(obj, name, key):
    orig = getattr(obj, name)
    def f(*a, **k):
        t0=time.perf_counter(); r = orig(*a, **k)
        stats[key]+=time.perf_counter()-t0; counts[key]+=1
        return r
    setattr(obj, name, f)

wrap(LM.LocalMapper, "insert_keyframe", "kf_insert")
wrap(LM.LocalMapper, "_associate_observations", " associate")
wrap(LM.LocalMapper, "_insert_stereo_points", " stereo_pts")
wrap(LM.LocalMapper, "_cull_recent_points", " cull")
wrap(LM.LocalMapper, "_triangulate_new_points", " triangulate")
wrap(FU.MapSearcher, "process", " fusion")
wrap(FU.MapSearcher, "_commit_fuse", "  fuse_commit")
wrap(FU.MapSearcher, "_fuse_points_into_kf", "  fuse_backward")
wrap(LBA_mod.LocalBA, "add", " lba_add")
for m in ("pack", "solve", "commit"):
    for cand in (f"_{m}", m):
        if hasattr(LBA_mod.LocalBA, cand):
            wrap(LBA_mod.LocalBA, cand, f"  lba_{m}"); break
import snakeslam_tpu.tracking.staging as ST
wrap(ST, "kf_features_cached", "  kf_feats")
from snakeslam_tpu.map.slam_map import SlamMap
wrap(SlamMap, "update_points_bulk", " upd_points_bulk")
wrap(SlamMap, "compute_median_depth", " median_depth")
from snakeslam_tpu.map.device_mirror import DeviceMapMirror
wrap(DeviceMapMirror, "sync", "  mirror_sync")
from snakeslam_tpu.optim.simplification import Simplification
wrap(Simplification, "add", " simplification")
from snakeslam_tpu.loop.loop_closing import LoopClosing
wrap(LoopClosing, "add", " loop_add")

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
print("--- warmup done ---")
for d in (stats, counts): d.clear()

system, frames = build(7, 400)
runner = WindowedRunner(system, window=64, two_stage=True)
t0 = time.perf_counter(); runner.run(frames); wall = time.perf_counter()-t0
print(f"wall {wall:.2f}s fps {len(system.tracker.trajectory)/wall:.1f} kfs {system.map.n_keyframes}")
for k in sorted(stats, key=lambda k:-stats[k]):
    print(f"{k:22s} {stats[k]:8.2f}s  n={counts[k]:4d}  avg={stats[k]/max(counts[k],1)*1000:7.1f}ms")
