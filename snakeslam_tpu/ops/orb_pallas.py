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


# ---------------------------------------------------------------------------
# per-keypoint patch gather
# ---------------------------------------------------------------------------

PATCH_GROUP = 8     # patches per grid program (DMAs kept in flight together)


def _patch_kernel(sy: int, sx: int, G: int, yt_ref, xt_ref, img_hbm,
                  out_ref, sems):
    """Pull G blocks of (sy, sx) from HBM with G async DMAs in flight:
    vmapped dynamic_slice lowers to a gather (~9 ms for 3200 46x46
    patches from an 8x480x752 batch); block DMAs issued back-to-back
    overlap each other's latency instead (~6 ms for 3200 56x256 blocks,
    per-DMA-issue bound).  Offsets arrive in TILE units and are expanded
    in-kernel so Mosaic can prove (8, 128) divisibility -- HBM memref
    slices must be tile-aligned."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    dmas = []
    for g in range(G):
        i = t * G + g
        y = yt_ref[b, i] * 8
        x = xt_ref[b, i] * 128
        d = pltpu.make_async_copy(
            img_hbm.at[b, pl.ds(y, sy), pl.ds(x, sx)],
            out_ref.at[0, g], sems.at[g])
        d.start()
        dmas.append(d)
    for d in dmas:
        d.wait()


@functools.partial(jax.jit, static_argnames=("size_y", "size_x",
                                             "interpret"))
def patch_gather_pallas(imgs: jax.Array, y_tile: jax.Array,
                        x_tile: jax.Array, size_y: int, size_x: int = 256,
                        interpret: bool | None = None):
    """(B, H, W) images + (B, N) int32 TILE corners -> (B, N, size_y,
    size_x) float32 blocks.

    TPU DMA constraints shape the API: offsets are in tile units (rows of
    8, lanes of 128) and sizes must be multiples of (8, 128).  To cover an
    arbitrary (46, 46) ORB patch at (y, x): y_tile = y // 8, x_tile =
    x // 128, size (56, 256), then slice [y % 8 :, x % 128 :] from the
    block.  Callers must keep y_tile*8 + size_y <= H etc."""
    assert size_y % 8 == 0 and size_x % 128 == 0, "tile-aligned sizes only"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W = imgs.shape
    N = y_tile.shape[1]
    G = PATCH_GROUP
    T = -(-N // G)
    pad = T * G - N
    if pad:
        y_tile = jnp.pad(y_tile, ((0, 0), (0, pad)))
        x_tile = jnp.pad(x_tile, ((0, 0), (0, pad)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, T),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, G, size_y, size_x),
                               lambda b, t, yt_ref, xt_ref: (b, t, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((G,))],
    )
    out = pl.pallas_call(
        functools.partial(_patch_kernel, size_y, size_x, G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T * G, size_y, size_x),
                                       jnp.float32),
        interpret=interpret,
    )(y_tile.astype(jnp.int32), x_tile.astype(jnp.int32),
      imgs.astype(jnp.float32))
    return out[:, :N]
