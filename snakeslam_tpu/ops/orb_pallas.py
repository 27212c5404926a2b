"""Pallas TPU kernel for the FAST-16 corner score.

The hottest stage of the ORB front-end (reference: the per-pixel segment
test inside saiga's ORBExtractor/ORBExtractorGPU) as a single fused VMEM
kernel: 16 ring reads, bright/dark arc masks, contiguous-9 bit test, and the
SAD score — one pass over the image with no intermediate HBM traffic.  A
VGA-class pyramid level (<= ~2 MB fp32) fits VMEM whole, so the kernel runs
as one program and lets the VPU stream the elementwise work.

Falls back to interpreter mode off-TPU (tests run it on CPU with
interpret=True and compare bit-exactly against ops/orb.fast_score).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snakeslam_tpu.ops.orb import FAST_RING


def _fast_kernel(img_ref, score_ref, corner_ref, *, threshold: float):
    img = img_ref[:]
    H, W = img.shape

    bits_b = jnp.zeros(img.shape, dtype=jnp.int32)
    bits_d = jnp.zeros(img.shape, dtype=jnp.int32)
    sum_b = jnp.zeros(img.shape, dtype=jnp.float32)
    sum_d = jnp.zeros(img.shape, dtype=jnp.float32)

    for k, (dx, dy) in enumerate(FAST_RING):
        # pltpu.roll requires non-negative shifts
        sy = (-int(dy)) % H
        sx = (-int(dx)) % W
        ring = pltpu.roll(pltpu.roll(img, sy, 0), sx, 1)
        bright = ring > img + threshold
        dark = ring < img - threshold
        bits_b = bits_b | (bright.astype(jnp.int32) << k)
        bits_d = bits_d | (dark.astype(jnp.int32) << k)
        sum_b = sum_b + jnp.where(bright, ring - img - threshold, 0.0)
        sum_d = sum_d + jnp.where(dark, img - ring - threshold, 0.0)

    def arc9(bits):
        m = bits | (bits << 16)
        acc = m
        for k in range(1, 9):
            acc = acc & (m >> k)
        return (acc & 0xFFFF) != 0

    corner = arc9(bits_b) | arc9(bits_d)
    yy = jax.lax.broadcasted_iota(jnp.int32, img.shape, 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, img.shape, 1)
    border = (yy >= 3) & (yy < H - 3) & (xx >= 3) & (xx < W - 3)
    corner = corner & border
    score = jnp.where(corner, jnp.maximum(sum_b, sum_d), 0.0)
    score_ref[:] = score
    corner_ref[:] = corner


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_pallas(img: jax.Array, threshold: float = 20.0,
                      interpret: bool | None = None):
    """FAST score via the Pallas kernel. Matches ops/orb.fast_score."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    img = img.astype(jnp.float32)
    score, corner = pl.pallas_call(
        functools.partial(_fast_kernel, threshold=float(threshold)),
        out_shape=(
            jax.ShapeDtypeStruct(img.shape, jnp.float32),
            jax.ShapeDtypeStruct(img.shape, jnp.bool_),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(img)
    return score, corner
