"""Pallas TPU kernel for the FAST-16 corner score.

The hottest stage of the ORB front-end (reference: the per-pixel segment
test inside saiga's ORBExtractor/ORBExtractorGPU) as a fused VMEM kernel:
16 ring reads, bright/dark arc masks, contiguous-9 bit test, and the SAD
score — one pass with no intermediate HBM traffic.

The image stays in HBM (``memory_space=ANY``); the grid walks row bands
and each program DMAs its band plus a 4-row halo into a VMEM scratch
buffer (the classic halo pattern — overlapping reads are not expressible
with BlockSpec tiling).  A 64-row band of a 752-wide image plus its ~10
full-band temporaries stays well under the 16 MB scoped-VMEM limit that
the whole-image version blew through.

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

BAND = 64        # rows per grid program
HALO = 4         # >= FAST ring radius (3), even for sublane alignment


def _fast_kernel(H: int, W: int, threshold: float, slot_rows: int,
                 img_hbm, score_ref, corner_ref, scratch, sem):
    """slot_rows: per-image row pitch when several images are stacked
    vertically in one buffer (slot_rows == padded total for a single
    image).  The border mask uses per-image local coordinates so stacked
    neighbors can never leak corners into each other."""
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * BAND, BAND + 2 * HALO)], scratch, sem)
    copy.start()
    copy.wait()
    img = scratch[...]
    Hb, Wb = img.shape

    bits_b = jnp.zeros(img.shape, dtype=jnp.int32)
    bits_d = jnp.zeros(img.shape, dtype=jnp.int32)
    sum_b = jnp.zeros(img.shape, dtype=jnp.float32)
    sum_d = jnp.zeros(img.shape, dtype=jnp.float32)

    for k, (dx, dy) in enumerate(FAST_RING):
        # pltpu.roll requires non-negative shifts; ring values that wrap
        # around the band edges only reach rows inside the halo, which the
        # output slice discards
        sy = (-int(dy)) % Hb
        sx = (-int(dx)) % Wb
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
    # border mask in per-image coordinates (W excludes lane padding)
    yy = jax.lax.broadcasted_iota(jnp.int32, img.shape, 0) \
        + i * BAND - HALO
    y_img = yy % slot_rows
    xx = jax.lax.broadcasted_iota(jnp.int32, img.shape, 1)
    border = (y_img >= 3) & (y_img < H - 3) & (xx >= 3) & (xx < W - 3)
    corner = corner & border
    score = jnp.where(corner, jnp.maximum(sum_b, sum_d), 0.0)
    score_ref[:] = score[HALO:HALO + BAND]
    corner_ref[:] = corner[HALO:HALO + BAND]


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_pallas(img: jax.Array, threshold: float = 20.0,
                      interpret: bool | None = None):
    """FAST score via the Pallas kernel. Matches ops/orb.fast_score."""
    score, corner = fast_score_pallas_batch(img[None], threshold, interpret)
    return score[0], corner[0]


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_pallas_batch(imgs: jax.Array, threshold: float = 20.0,
                            interpret: bool | None = None):
    """Batched FAST: (B, H, W) images -> (B, H, W) scores + corner masks.

    The batch stacks vertically into ONE banded kernel launch: each image
    occupies a band-aligned row slot, and the kernel's border mask works in
    per-image coordinates, so a frame window costs one pallas_call instead
    of B (the win is grid-level pipelining of the band DMAs, plus one
    dispatch on the host side)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    imgs = imgs.astype(jnp.float32)
    B, H, W = imgs.shape
    bands_per_img = -(-H // BAND)
    S = bands_per_img * BAND              # per-image row slot (band-aligned)
    n_bands = B * bands_per_img
    Wp = -(-W // 128) * 128               # lane-dim alignment
    padded = jnp.zeros((n_bands * BAND + 2 * HALO, Wp), dtype=jnp.float32)
    imgs_p = jnp.pad(imgs, ((0, 0), (0, S - H), (0, Wp - W)))
    padded = jax.lax.dynamic_update_slice(
        padded, imgs_p.reshape(B * S, Wp), (HALO, 0)
    )

    score, corner = pl.pallas_call(
        functools.partial(_fast_kernel, H, W, float(threshold), S),
        grid=(n_bands,),
        out_shape=(
            jax.ShapeDtypeStruct((n_bands * BAND, Wp), jnp.float32),
            jax.ShapeDtypeStruct((n_bands * BAND, Wp), jnp.bool_),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((BAND, Wp), lambda i: (i, 0)),
            pl.BlockSpec((BAND, Wp), lambda i: (i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((BAND + 2 * HALO, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    score = score.reshape(B, S, Wp)[:, :H, :W]
    corner = corner.reshape(B, S, Wp)[:, :H, :W]
    return score, corner
