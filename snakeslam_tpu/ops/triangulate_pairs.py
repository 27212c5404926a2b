"""Batched epipolar matching + triangulation between keyframe pairs.

TPU-native replacement for the reference's Triangulator inner loop
(reference: Snake/LocalMapping/Triangulator.cpp:113-294 — per KF-pair
epipolar BoW-bucketed search, parallax arbitration, DLT, two-sided chi2 and
scale-consistency gates) and MappingORBMatcher::SearchForTriangulation2
(Snake/LocalMapping/MappingORBMatcher.cpp:14-102).  The whole candidate
matrix per pair is evaluated densely on the MXU; the 10-neighbor fan-out is a
vmap over pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from snakeslam_tpu.core import lie
from snakeslam_tpu.core.camera import Pinhole
from snakeslam_tpu.ops.descriptors import hamming_matrix
from snakeslam_tpu.ops.matching import FrameFeatures
from snakeslam_tpu.ops.triangulation import triangulate_homogeneous
from snakeslam_tpu.ops.twoview import essential_matrix, epipolar_distance_squared

FEATURE_DISTANCE = 50     # Triangulator params (LocalMapping.cpp:317-329)
EPIPOLAR_DISTANCE = 4.0   # px
ERROR_MONO = 2.1
ERROR_STEREO = 2.3


def _normalized(cam: Pinhole, uv):
    return jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy],
        axis=-1,
    )


@functools.partial(
    jax.jit,
    static_argnames=("feature_distance", "epipolar_distance", "error_mono",
                     "bounds_wh"),
)
def triangulate_pair(
    feats_a: FrameFeatures,
    feats_b: FrameFeatures,
    free_a: jax.Array,          # (N,) feature has no map point yet
    free_b: jax.Array,
    T_a: jax.Array,             # (4, 4) world->cam
    T_b: jax.Array,
    cam: Pinhole,
    bf: jax.Array,
    scales: jax.Array,          # (L,)
    inv_sigma2: jax.Array,      # (L,)
    feature_distance: int = FEATURE_DISTANCE,
    epipolar_distance: float = EPIPOLAR_DISTANCE,
    error_mono: float = ERROR_MONO,
    grid_a: jax.Array | None = None,   # (GH, GW) depth grid for image a
    bounds_wh: tuple = (752.0, 480.0),
):
    """Match unmatched features across one KF pair and triangulate.

    Returns dict with per-A-feature arrays:
      match_b (N,) int32 (-1 = none), point (N, 3) world, valid (N,) bool.
    """
    N = feats_a.uv.shape[0]

    # relative geometry: E maps so that xn_a^T E xn_b = 0, with
    # T_ab = T_a @ T_b^-1 (cam_b -> cam_a)
    T_ab = T_a @ lie.se3_inverse(T_b)
    E = essential_matrix(T_ab)

    xn_a = _normalized(cam, feats_a.uv)
    xn_b = _normalized(cam, feats_b.uv)

    # pairwise gates
    H = hamming_matrix(feats_a.desc_bits, feats_b.desc_bits)
    # symmetric epipolar line distance for ALL pairs, in pixels
    ones_a = jnp.ones((N, 1), dtype=xn_a.dtype)
    h_a = jnp.concatenate([xn_a, ones_a], axis=1)          # (N, 3)
    h_b = jnp.concatenate([xn_b, jnp.ones_like(ones_a)], axis=1)
    l_b = h_a @ E                                          # (N, 3) line in b
    val = l_b @ h_b.T                                      # (N, M)
    l_a = h_b @ E.T                                        # (M, 3) line in a
    da2 = val**2 / jnp.maximum(
        (l_a[:, 0] ** 2 + l_a[:, 1] ** 2)[None, :], 1e-12
    )
    db2 = val**2 / jnp.maximum(
        (l_b[:, 0] ** 2 + l_b[:, 1] ** 2)[:, None], 1e-12
    )
    focal2 = cam.fx * cam.fy
    epi_px2 = 0.5 * (da2 + db2) * focal2                   # (N, M) pixels^2

    oct_ok = jnp.abs(
        feats_a.octave[:, None] - feats_b.octave[None, :]
    ) <= 1
    pair_ok = (
        (H <= feature_distance)
        & (epi_px2 <= epipolar_distance**2)
        & oct_ok
        & (free_a & feats_a.valid)[:, None]
        & (free_b & feats_b.valid)[None, :]
    )
    Hm = jnp.where(pair_ok, H, 256)
    best = jnp.min(Hm, axis=1)
    best_idx = jnp.argmin(Hm, axis=1).astype(jnp.int32)
    matched = best <= feature_distance

    # mutual best check (each b feature claimed once)
    rev_best = jnp.argmin(Hm, axis=0).astype(jnp.int32)
    matched = matched & (rev_best[best_idx] == jnp.arange(N))

    if grid_a is not None:
        # depth-guided second tier (SearchForTriangulationProject,
        # MappingORBMatcher.cpp:168-250): features the epipolar-best pass
        # left unmatched retry within a 20 px window around where the
        # depth-completion grid predicts them in image b — the depth prior
        # breaks repeated-texture ambiguity along the epipolar line.
        GH, GW = grid_a.shape
        gx = jnp.clip((feats_a.uv[:, 0] / bounds_wh[0] * GW)
                      .astype(jnp.int32), 0, GW - 1)
        gy = jnp.clip((feats_a.uv[:, 1] / bounds_wh[1] * GH)
                      .astype(jnp.int32), 0, GH - 1)
        z = grid_a[gy, gx]
        has_z = z > 1e-6
        # unproject feature a at grid depth, express in cam b, project
        Pa = jnp.concatenate([xn_a * z[:, None], z[:, None]], axis=1)
        Pb = lie.transform_points(lie.se3_inverse(T_ab), Pa)
        zb_pred = jnp.maximum(Pb[:, 2], 1e-6)
        uv_pred = jnp.stack(
            [cam.fx * Pb[:, 0] / zb_pred + cam.cx,
             cam.fy * Pb[:, 1] / zb_pred + cam.cy], axis=1)
        win2 = jnp.sum(
            (feats_b.uv[None, :, :] - uv_pred[:, None, :]) ** 2, axis=-1)
        proj_ok = (win2 <= 20.0**2) & (has_z & (Pb[:, 2] > 0))[:, None]
        # b features claimed by the first tier stay claimed
        claimed = jnp.zeros(feats_b.uv.shape[0], dtype=bool
                            ).at[best_idx].max(matched)
        Hm2 = jnp.where(pair_ok & proj_ok & ~claimed[None, :], H, 256)
        best2 = jnp.min(Hm2, axis=1)
        best_idx2 = jnp.argmin(Hm2, axis=1).astype(jnp.int32)
        matched2 = (~matched) & (best2 <= feature_distance)
        best_idx = jnp.where(matched2, best_idx2, best_idx)
        matched = matched | matched2

    xb = xn_b[best_idx]
    X = triangulate_homogeneous(
        jnp.broadcast_to(T_a, (N, 4, 4)),
        jnp.broadcast_to(T_b, (N, 4, 4)),
        xn_a, xb,
    )

    # gates (Triangulator.cpp:113-294)
    pa = lie.transform_points(T_a, X)
    pb = lie.transform_points(T_b, X)
    za, zb = pa[:, 2], pb[:, 2]
    front = (za > 1e-3) & (zb > 1e-3)

    # parallax: require > ~0.57 deg between rays
    ca = lie.translation(lie.se3_inverse(T_a))
    cb = lie.translation(lie.se3_inverse(T_b))
    ra = X - ca
    rb = X - cb
    cosp = jnp.sum(ra * rb, axis=1) / jnp.maximum(
        jnp.linalg.norm(ra, axis=1) * jnp.linalg.norm(rb, axis=1), 1e-12
    )
    parallax_ok = cosp < 0.99995

    # two-sided chi2 with per-octave sigma
    zsa = jnp.where(front, za, 1.0)
    zsb = jnp.where(front, zb, 1.0)
    ua = jnp.stack([cam.fx * pa[:, 0] / zsa + cam.cx,
                    cam.fy * pa[:, 1] / zsa + cam.cy], axis=1)
    ub = jnp.stack([cam.fx * pb[:, 0] / zsb + cam.cx,
                    cam.fy * pb[:, 1] / zsb + cam.cy], axis=1)
    La = jnp.clip(feats_a.octave, 0, scales.shape[0] - 1)
    Lb = jnp.clip(feats_b.octave[best_idx], 0, scales.shape[0] - 1)
    ea2 = jnp.sum((ua - feats_a.uv) ** 2, axis=1) * inv_sigma2[La]
    eb2 = jnp.sum(
        (ub - feats_b.uv[best_idx]) ** 2, axis=1
    ) * inv_sigma2[Lb]
    chi_ok = (ea2 <= error_mono**2) & (eb2 <= error_mono**2)

    # scale consistency: distance ratio must match octave scale ratio
    dist_a = jnp.linalg.norm(ra, axis=1)
    dist_b = jnp.linalg.norm(rb, axis=1)
    ratio_dist = dist_a / jnp.maximum(dist_b, 1e-9)
    ratio_oct = scales[La] / scales[Lb]
    factor = 1.5 * scales[1] if scales.shape[0] > 1 else 1.8
    scale_ok = (ratio_dist < ratio_oct * factor) & (
        ratio_dist * factor > ratio_oct
    )

    valid = matched & front & parallax_ok & chi_ok & scale_ok
    return {
        "match_b": jnp.where(valid, best_idx, -1),
        "point": X,
        "valid": valid,
        "n_new": jnp.sum(valid),
    }


# vmapped fan-out over neighbor pairs: feats_b/T_b/free_b get a leading dim
triangulate_pairs_batch = jax.jit(
    jax.vmap(
        triangulate_pair,
        in_axes=(None, 0, None, 0, None, 0, None, None, None, None),
    )
)
