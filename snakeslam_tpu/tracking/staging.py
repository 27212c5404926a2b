"""Host->device staging: pad frames and local-map snapshots to fixed shapes.

The device-side equivalents of the reference's ``LocalMap<T>`` snapshots
(reference: Snake/Map/LocalMap.h:17-79): local copies of point payload so the
jitted matchers never touch the live map.  All outputs have static shapes
(feature_slots / local_map_slots) so nothing recompiles per frame.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from snakeslam_tpu.map.slam_map import FrameData, SlamMap
from snakeslam_tpu.ops.descriptors import unpack_bits
from snakeslam_tpu.ops.matching import FrameFeatures, LocalMapPoints

F32 = np.float32


@jax.jit
def _stage_features(uv, right, octave, angle, desc_packed, valid):
    """Device-side staging: descriptors travel packed (32 B) over the
    H2D link — 8x less transfer — and expand to bit planes on device."""
    return FrameFeatures(
        uv=uv, right=right, octave=octave, angle=angle,
        desc_bits=unpack_bits(desc_packed).astype(jnp.int8),
        valid=valid,
    )


def pad_frame_features(frame: FrameData, n_slots: int) -> FrameFeatures:
    n = min(frame.n, n_slots)
    uv = np.zeros((n_slots, 2), dtype=F32)
    right = np.full(n_slots, -1.0, dtype=F32)
    octave = np.zeros(n_slots, dtype=np.int32)
    angle = np.zeros(n_slots, dtype=F32)
    desc = np.zeros((n_slots, 32), dtype=np.uint8)
    uv[:n] = frame.uv[:n]
    right[:n] = frame.right[:n]
    octave[:n] = frame.octave[:n]
    angle[:n] = frame.angle[:n]
    desc[:n] = frame.descriptors[:n]
    valid = np.arange(n_slots) < n
    return _stage_features(
        jnp.asarray(uv), jnp.asarray(right), jnp.asarray(octave),
        jnp.asarray(angle), jnp.asarray(desc), jnp.asarray(valid),
    )


def kf_features_cached(smap: SlamMap, kf: int, n_slots: int):
    """Device-side FrameFeatures view of a keyframe's stored features.

    Keyframe features are immutable, so the staged arrays are cached on the
    map (evicted when the keyframe is erased) — fusion, triangulation, and
    loop verification all reuse the same device buffers.
    """
    cache = getattr(smap, "_kf_feat_cache", None)
    if cache is None:
        cache = smap._kf_feat_cache = {}
    hit = cache.get(kf)
    if hit is not None and hit[0] == n_slots:
        return hit[1]
    n = int(smap.kf_n_feat[kf])
    n = min(n, n_slots)
    desc = np.zeros((n_slots, 32), dtype=np.uint8)
    desc[:n] = smap.kf_feat_desc[kf, :n]
    ff = _stage_features(
        jnp.asarray(np.pad(
            smap.kf_feat_uv[kf, :n], ((0, n_slots - n), (0, 0))
        ).astype(F32)),
        jnp.asarray(np.pad(
            smap.kf_feat_right[kf, :n], (0, n_slots - n), constant_values=-1
        ).astype(F32)),
        jnp.asarray(np.pad(
            smap.kf_feat_octave[kf, :n].astype(np.int32), (0, n_slots - n)
        )),
        jnp.asarray(np.pad(
            smap.kf_feat_angle[kf, :n], (0, n_slots - n)
        ).astype(F32)),
        jnp.asarray(desc),
        jnp.asarray(np.arange(n_slots) < n),
    )
    cache[kf] = (n_slots, ff)
    return ff


def snapshot_points(
    smap: SlamMap,
    point_ids: np.ndarray,
    n_slots: int,
    angles: np.ndarray | None = None,
    octaves: np.ndarray | None = None,
):
    """Build a LocalMapPoints snapshot for `point_ids` (host gather -> device).

    Args:
      angles/octaves: optional per-point override (frame-frame coarse matching
        uses the last frame's keypoint angle/octave instead of the map point's
        reference level — reference: CoarseTrackingPoint, LocalMap.h:17-33).

    Returns (LocalMapPoints, ids_used (<= n_slots)).
    """
    ids = np.asarray(point_ids[:n_slots], dtype=np.int64)
    n = len(ids)
    pos = np.zeros((n_slots, 3), dtype=F32)
    normal = np.zeros((n_slots, 3), dtype=F32)
    bits = np.zeros((n_slots, 256), dtype=np.int8)
    ref_depth = np.ones(n_slots, dtype=F32)
    ref_level = np.zeros(n_slots, dtype=np.int32)
    angle = np.zeros(n_slots, dtype=F32)
    if n > 0:
        pos[:n] = smap.pt_pos[ids]
        normal[:n] = smap.pt_normal[ids]
        bits[:n] = smap.pt_bits[ids]
        ref_depth[:n] = smap.pt_ref_depth[ids]
        ref_level[:n] = (octaves[:n] if octaves is not None
                         else smap.pt_ref_level[ids])
        if angles is not None:
            angle[:n] = angles[:n]
    valid = np.arange(n_slots) < n
    lm = LocalMapPoints(
        position=jnp.asarray(pos),
        normal=jnp.asarray(normal),
        desc_bits=jnp.asarray(bits),
        ref_depth=jnp.asarray(ref_depth),
        ref_level=jnp.asarray(ref_level),
        angle=jnp.asarray(angle),
        valid=jnp.asarray(valid),
    )
    return lm, ids
