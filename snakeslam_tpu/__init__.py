"""snakeslam_tpu — a TPU-native visual-inertial SLAM framework.

Brand-new JAX/XLA/Pallas implementation with the capability set of
darglein/Snake-SLAM (see /root/repo/SURVEY.md for the structural analysis of
the reference).  The compute path (feature extraction, matching, pose
optimization, bundle adjustment, IMU solvers) is jit-compiled fixed-shape XLA
with Pallas kernels for the hot ops; the orchestration layer (pipeline stages,
map bookkeeping, keyframe-graph logic) is host-side Python over preallocated
numpy arrays, mirroring the reference's snapshot → lock-free compute → guarded
commit idiom (reference: Snake/Map/LocalMap.h:34-55).

Layout:
  core/      SE3/Sim3 Lie algebra, camera & distortion models, trajectory eval
  ops/       device kernels: ORB, Hamming matching, GN solvers, BA, IMU, BoW
  models/    flagship jittable step functions (tracking megastep, BA step)
  map/       map data model (fixed-capacity keyframe/point pools)
  frontend/  dataset loaders, feature detection, preprocessing
  tracking/  predictor, coarse/fine tracking, keyframe decision, initializers
  mapping/   local mapping, triangulation, neighbor fusion
  optim/     local/global BA drivers, simplification, deferred mapping
  loop/      loop closing, keyframe database, pose-graph optimization
  imu/       IMU state solver state machine, decoupled full solver
  system/    settings, system driver, performance stats, trajectory IO
  parallel/  device mesh / sharding utilities for multi-chip execution
  utils/     config, logging, small helpers
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls on float32 inputs default to bf16 passes; the GN/BA normal
# equations and SE3 chains need true f32.  The Hamming matcher opts into bf16
# explicitly (exact for 0/1 bit planes), so this costs nothing on the hot
# matching path.
_jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: the pipeline's jitted programs (tracking
# megasteps, BA, matchers) compile once per shape and reload instantly in
# later processes — TPU compiles are 20-40 s each.  Enabled only when a TPU
# platform is configured: CPU AOT artifacts are machine-feature-specific and
# reloading them across feature sets mis-executes.
import os as _os

_cache_dir = _os.environ.get(
    "SNAKESLAM_JIT_CACHE",
    _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
)
if "cpu" not in _os.environ.get("JAX_PLATFORMS", "").lower():
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
