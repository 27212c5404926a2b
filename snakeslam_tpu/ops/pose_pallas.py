"""Fused Pallas pose-GN kernel: a whole robust pose refine in ONE launch.

The windowed tracking scan (models/window_step.py) runs a robust
Gauss-Newton pose refine for every frame.  Expressed in XLA that refine is
~60 small fusion kernels per frame (Jacobian sweeps, 6x6 solve, SE3 exp,
outlier classification), and at ~10-20 us of launch overhead per kernel the
scan is launch-bound, not compute-bound (measured: the GN portion is >half
of window_track device time at <1% VPU utilization).

This kernel runs the ENTIRE refine — ``outer_iters`` rounds of
(``inner_iters`` damped GN steps -> chi2 outlier re-classification) — in
one ``pallas_call``:

  * per-feature arrays live as (N/128, 128) f32 tiles in VMEM (full VPU
    lanes); the eight fields arrive as ONE packed (8, N/128, 128) input;
  * the 6x6 normal equations accumulate as 27 VPU reductions;
  * the 6x6 solve, SE(3) exponential and pose composition run as scalar
    arithmetic (a closed-form 3x3-block Schur elimination — no custom
    calls);
  * outputs are the refined pose row and the inlier mask.

Semantics mirror ops/pose_solver.robust_pose_refine (saiga's
RobustPoseOptimization, reference: Snake/Tracking/PoseRefinement.h:9-10):
left-multiplicative update, Huber weights at the mono/stereo pixel
thresholds (SnakeGlobal.h:145-146), chi2 classification between rounds.
The motion-prior variant stays on the XLA path (used per-frame by the
tracker, not in the scan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snakeslam_tpu.core import lie
from snakeslam_tpu.core.camera import Pinhole


# ---------------------------------------------------------------------------
# scalar 3x3 helpers (tuples of traced scalars -> pure scalar arithmetic,
# mirrors ops/linalg.inv3x3 exactly)
# ---------------------------------------------------------------------------

def _inv3(m):
    (a, b, c), (d, e, f), (g, h, i) = m
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return ((A11 / det, A12 / det, A13 / det),
            (A21 / det, A22 / det, A23 / det),
            (A31 / det, A32 / det, A33 / det))


def _m3v(m, v):
    return tuple(m[r][0] * v[0] + m[r][1] * v[1] + m[r][2] * v[2]
                 for r in range(3))


def _m3m(a, b):
    return tuple(
        tuple(a[r][0] * b[0][c] + a[r][1] * b[1][c] + a[r][2] * b[2][c]
              for c in range(3))
        for r in range(3))


def _m3t(m):
    return tuple(tuple(m[c][r] for c in range(3)) for r in range(3))


def _solve6_scalar(H, b):
    """H: 6x6 nested scalar tuple (PSD, damped); b: 6 scalars."""
    A = tuple(tuple(H[r][c] for c in range(3)) for r in range(3))
    B = tuple(tuple(H[r][c + 3] for c in range(3)) for r in range(3))
    D = tuple(tuple(H[r + 3][c + 3] for c in range(3)) for r in range(3))
    b1 = (b[0], b[1], b[2])
    b2 = (b[3], b[4], b[5])
    Ai = _inv3(A)
    BtAi = _m3m(_m3t(B), Ai)
    S = tuple(tuple(D[r][c]
                    - (BtAi[r][0] * B[0][c] + BtAi[r][1] * B[1][c]
                       + BtAi[r][2] * B[2][c])
              for c in range(3)) for r in range(3))
    rhs2 = tuple(b2[r] - (BtAi[r][0] * b1[0] + BtAi[r][1] * b1[1]
                          + BtAi[r][2] * b1[2]) for r in range(3))
    x2 = _m3v(_inv3(S), rhs2)
    rhs1 = tuple(b1[r] - (B[r][0] * x2[0] + B[r][1] * x2[1]
                          + B[r][2] * x2[2]) for r in range(3))
    x1 = _m3v(Ai, rhs1)
    return x1 + x2


def _se3_exp_scalar(v, w):
    """Sophus-convention exp: (upsilon, omega) -> (R 3x3, t 3) scalars."""
    th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    th = jnp.sqrt(th2 + 1e-30)
    small = th < 1e-4
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    bb = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / (th2 + 1e-30))
    cc = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                   (th - jnp.sin(th)) / (th2 * th + 1e-30))
    W = ((0.0 * th, -w[2], w[1]), (w[2], 0.0 * th, -w[0]),
         (-w[1], w[0], 0.0 * th))
    W2 = _m3m(W, W)
    eye = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
    R = tuple(tuple(eye[r][c] + a * W[r][c] + bb * W2[r][c]
              for c in range(3)) for r in range(3))
    V = tuple(tuple(eye[r][c] + bb * W[r][c] + cc * W2[r][c]
              for c in range(3)) for r in range(3))
    return R, _m3v(V, v)


def _gram_schmidt(R):
    """Project a near-rotation back to SO(3) (column-wise modified GS)."""
    c0 = (R[0][0], R[1][0], R[2][0])
    n0 = jax.lax.rsqrt(c0[0] ** 2 + c0[1] ** 2 + c0[2] ** 2 + 1e-30)
    c0 = (c0[0] * n0, c0[1] * n0, c0[2] * n0)
    c1 = (R[0][1], R[1][1], R[2][1])
    d = c0[0] * c1[0] + c0[1] * c1[1] + c0[2] * c1[2]
    c1 = (c1[0] - d * c0[0], c1[1] - d * c0[1], c1[2] - d * c0[2])
    n1 = jax.lax.rsqrt(c1[0] ** 2 + c1[1] ** 2 + c1[2] ** 2 + 1e-30)
    c1 = (c1[0] * n1, c1[1] * n1, c1[2] * n1)
    c2 = (c0[1] * c1[2] - c0[2] * c1[1],
          c0[2] * c1[0] - c0[0] * c1[2],
          c0[0] * c1[1] - c0[1] * c1[0])
    return ((c0[0], c1[0], c2[0]), (c0[1], c1[1], c2[1]),
            (c0[2], c1[2], c2[2]))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _pose_refine_kernel(tc_ref, data_ref, T_out_ref, inlier_ref,
                        *, outer_iters: int, inner_iters: int):
    fx = tc_ref[0, 16]
    fy = tc_ref[0, 17]
    cx = tc_ref[0, 18]
    cy = tc_ref[0, 19]
    bf = tc_ref[0, 20]
    chi2_m = tc_ref[0, 21]
    chi2_s = tc_ref[0, 22]
    damping = tc_ref[0, 23]

    px = data_ref[0]
    py = data_ref[1]
    pz = data_ref[2]
    uo = data_ref[3]
    vo = data_ref[4]
    ro = data_ref[5]
    wgt = data_ref[6]
    msk = data_ref[7] > 0.5

    has_stereo = ro > 0.0
    sflag = has_stereo.astype(jnp.float32)
    delta_h = jnp.where(has_stereo, jnp.sqrt(chi2_s), jnp.sqrt(chi2_m))
    th_cls = jnp.where(has_stereo, chi2_s, chi2_m)
    w2 = wgt * wgt

    Tf0 = tuple(tc_ref[0, k] for k in range(12))  # row-major R|t (3x4)

    def transform(Tf):
        X = Tf[0] * px + Tf[1] * py + Tf[2] * pz + Tf[3]
        Y = Tf[4] * px + Tf[5] * py + Tf[6] * pz + Tf[7]
        Z = Tf[8] * px + Tf[9] * py + Tf[10] * pz + Tf[11]
        return X, Y, Z

    def residuals(Tf):
        X, Y, Z = transform(Tf)
        z_ok = Z > 1e-4
        zs = jnp.where(z_ok, Z, 1.0)
        iz = 1.0 / zs
        u = fx * X * iz + cx
        v = fy * Y * iz + cy
        ru = u - uo
        rv = v - vo
        rr = jnp.where(has_stereo, u - bf * iz - ro, 0.0)
        chi2 = w2 * (ru * ru + rv * rv + rr * rr)
        return X, Y, Z, z_ok, iz, ru, rv, rr, chi2

    def gn_step(Tf, inlier):
        X, Y, Z, z_ok, iz, ru, rv, rr, chi2 = residuals(Tf)
        iz2 = iz * iz
        e = jnp.sqrt(chi2 + 1e-12)
        huber = jnp.minimum(1.0, delta_h / e)
        wt = jnp.where(msk & z_ok & inlier, w2 * huber, 0.0)
        # Jacobian rows (J = Jp @ [I | -hat(pc)], PoseRefinement.h:52-53);
        # NOTE raw Z (not the clamped zs) in the hat-block terms, matching
        # ops/pose_solver._residuals_jacobians
        j0 = (fx * iz, jnp.zeros_like(iz), -fx * X * iz2,
              -fx * X * Y * iz2, fx * Z * iz + fx * X * X * iz2,
              -fx * Y * iz)
        j1 = (jnp.zeros_like(iz), fy * iz, -fy * Y * iz2,
              -fy * Z * iz - fy * Y * Y * iz2, fy * X * Y * iz2,
              fy * X * iz)
        j2 = (sflag * (fx * iz), jnp.zeros_like(iz),
              sflag * ((bf - fx * X) * iz2),
              sflag * ((bf - fx * X) * Y * iz2),
              sflag * (fx * Z * iz + (fx * X - bf) * X * iz2),
              sflag * (-fx * Y * iz))
        H = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i, 6):
                H[i][j] = jnp.sum(
                    wt * (j0[i] * j0[j] + j1[i] * j1[j] + j2[i] * j2[j]))
                H[j][i] = H[i][j]
        for i in range(6):
            H[i][i] = H[i][i] + damping
        b = tuple(jnp.sum(wt * (j0[i] * ru + j1[i] * rv + j2[i] * rr))
                  for i in range(6))
        d = _solve6_scalar(tuple(tuple(r) for r in H), b)
        Rd, td = _se3_exp_scalar((-d[0], -d[1], -d[2]),
                                 (-d[3], -d[4], -d[5]))
        RT = ((Tf[0], Tf[1], Tf[2]), (Tf[4], Tf[5], Tf[6]),
              (Tf[8], Tf[9], Tf[10]))
        tT = (Tf[3], Tf[7], Tf[11])
        Rn = _m3m(Rd, RT)
        tn = _m3v(Rd, tT)
        tn = (tn[0] + td[0], tn[1] + td[1], tn[2] + td[2])
        return (Rn[0][0], Rn[0][1], Rn[0][2], tn[0],
                Rn[1][0], Rn[1][1], Rn[1][2], tn[1],
                Rn[2][0], Rn[2][1], Rn[2][2], tn[2])

    Tf = Tf0
    inlier = msk
    for _ in range(outer_iters):
        for _ in range(inner_iters):
            Tf = gn_step(Tf, inlier)
        _, _, _, z_ok, _, _, _, _, chi2 = residuals(Tf)
        inlier = msk & z_ok & (chi2 <= th_cls)

    R = _gram_schmidt(((Tf[0], Tf[1], Tf[2]), (Tf[4], Tf[5], Tf[6]),
                       (Tf[8], Tf[9], Tf[10])))
    out = (R[0][0], R[0][1], R[0][2], Tf[3],
           R[1][0], R[1][1], R[1][2], Tf[7],
           R[2][0], R[2][1], R[2][2], Tf[11],
           jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
           jnp.float32(1.0))
    for k in range(16):
        T_out_ref[0, k] = out[k]
    inlier_ref[:] = inlier.astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("outer_iters", "inner_iters",
                                    "interpret"))
def pose_refine_fused(T_init, points, uv, right, weight, mask,
                      cam: Pinhole, bf,
                      chi2_mono: float = 2.1 ** 2,
                      chi2_stereo: float = 2.3 ** 2,
                      outer_iters: int = 2, inner_iters: int = 2,
                      damping: float = 1e-5,
                      interpret: bool | None = None):
    """One-launch robust pose refine.  Returns (T, inlier_mask, n_inliers).

    ``points`` (N, 3), ``uv`` (N, 2), ``right``/``weight`` (N,), ``mask``
    (N,) bool; N must be a multiple of 128.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = points.shape[0]
    G = N // 128
    f32 = jnp.float32
    data = jnp.stack([
        points[:, 0].astype(f32).reshape(G, 128),
        points[:, 1].astype(f32).reshape(G, 128),
        points[:, 2].astype(f32).reshape(G, 128),
        uv[:, 0].astype(f32).reshape(G, 128),
        uv[:, 1].astype(f32).reshape(G, 128),
        right.astype(f32).reshape(G, 128),
        weight.astype(f32).reshape(G, 128),
        mask.astype(f32).reshape(G, 128),
    ])
    tc = jnp.concatenate([
        T_init.reshape(-1).astype(f32),        # [0:16] row-major 4x4
        jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy, bf,
                   f32(chi2_mono), f32(chi2_stereo),
                   f32(damping)]).astype(f32),  # [16:24]
        jnp.zeros((8,), f32),
    ]).reshape(1, 32)
    T_row, inl = pl.pallas_call(
        functools.partial(_pose_refine_kernel, outer_iters=outer_iters,
                          inner_iters=inner_iters),
        out_shape=(jax.ShapeDtypeStruct((1, 16), f32),
                   jax.ShapeDtypeStruct((G, 128), f32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(tc, data)
    T = jnp.concatenate([
        T_row.reshape(4, 4)[:3],
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], dtype=f32),
    ])
    inlier = inl.reshape(N) > 0.5
    return T, inlier, jnp.sum(inlier)
