"""ORB front-end tests on rendered synthetic images."""

import numpy as np
import jax
import jax.numpy as jnp

from snakeslam_tpu.ops import orb as ORB
from snakeslam_tpu.ops.orb_pallas import fast_score_pallas
from snakeslam_tpu.ops.matching import knn2_ratio_match


def render_scene(rng, H=240, W=320, n_rects=40):
    """Gray background + random bright/dark rectangles (corner-rich)."""
    img = np.full((H, W), 128.0, dtype=np.float32)
    for _ in range(n_rects):
        h = rng.integers(8, 40)
        w = rng.integers(8, 40)
        y = rng.integers(0, H - h)
        x = rng.integers(0, W - w)
        val = rng.choice([40.0, 90.0, 170.0, 220.0])
        img[y:y + h, x:x + w] = val
    return img


def test_fast_detects_square_corners(rng):
    img = np.full((64, 64), 100.0, dtype=np.float32)
    img[20:40, 20:40] = 200.0
    score, corner = ORB.fast_score(jnp.asarray(img), 20.0)
    corner = np.asarray(corner)
    # corners of the square fire; flat regions and straight edges don't
    assert corner[20, 20] or corner[20, 21] or corner[21, 20]
    assert not corner[10, 10]      # flat
    assert not corner[20, 30]      # straight edge midpoint
    assert not corner[30, 30]      # interior


def test_pallas_fast_matches_xla(rng):
    img = render_scene(rng)
    s1, c1 = ORB.fast_score(jnp.asarray(img), 20.0)
    s2, c2 = fast_score_pallas(jnp.asarray(img), 20.0, interpret=True)
    assert (np.asarray(c1) == np.asarray(c2)).all()
    assert np.abs(np.asarray(s1) - np.asarray(s2)).max() < 1e-4


def test_extract_orb_basic(rng):
    img = render_scene(rng)
    feats = ORB.extract_orb(jnp.asarray(img), n_features=300, levels=3)
    valid = np.asarray(feats.valid)
    assert valid.sum() > 100
    uv = np.asarray(feats.uv)[valid]
    assert (uv[:, 0] >= 0).all() and (uv[:, 0] < 320).all()
    # spatial distribution: keypoints spread over at least half the cells
    cells = set(map(tuple, (uv // 64).astype(int)))
    assert len(cells) >= 8
    octv = np.asarray(feats.octave)[valid]
    assert octv.max() >= 1  # multiple pyramid levels contribute


def test_orb_descriptor_repeatability(rng):
    img = render_scene(rng, n_rects=60)
    shift = 5
    img2 = np.roll(img, shift, axis=1)
    f1 = ORB.extract_orb(jnp.asarray(img), n_features=300, levels=2)
    f2 = ORB.extract_orb(jnp.asarray(img2), n_features=300, levels=2)
    idx, dist = knn2_ratio_match(
        f1.desc_bits, f2.desc_bits, f1.valid, f2.valid,
        ratio=0.8, max_dist=60,
    )
    idx = np.asarray(idx)
    matched = np.nonzero(idx >= 0)[0]
    assert len(matched) > 40
    duv = np.asarray(f2.uv)[idx[matched]] - np.asarray(f1.uv)[matched]
    # the dominant displacement equals the shift
    med = np.median(duv, axis=0)
    assert abs(med[0] - shift) < 1.0
    assert abs(med[1]) < 1.0


def test_orientation_consistency(rng):
    # a gradient patch: rotating the image by 180 deg flips the centroid angle
    img = render_scene(rng, n_rects=30)
    f1 = ORB.extract_orb(jnp.asarray(img), n_features=100, levels=1)
    img_rot = img[::-1, ::-1].copy()
    f2 = ORB.extract_orb(jnp.asarray(img_rot), n_features=100, levels=1)
    idx, _ = knn2_ratio_match(
        f1.desc_bits, f2.desc_bits, f1.valid, f2.valid,
        ratio=0.8, max_dist=60,
    )
    idx = np.asarray(idx)
    matched = np.nonzero(idx >= 0)[0]
    assert len(matched) > 15
    a1 = np.asarray(f1.angle)[matched]
    a2 = np.asarray(f2.angle)[idx[matched]]
    d = np.abs(((a1 - a2 + 180.0) % 360.0) - 180.0)
    # angles should differ by ~180 deg for most matches
    assert np.median(np.abs(d - 180.0)) < 25.0 or np.median(d) > 150.0


def test_patch_gather_pallas_matches_slicing(rng):
    from snakeslam_tpu.ops.orb_pallas import patch_gather_pallas

    img = rng.uniform(0, 255, (2, 104, 384)).astype(np.float32)
    yt = rng.integers(0, (104 - 48) // 8, (2, 13)).astype(np.int32)
    xt = rng.integers(0, (384 - 128) // 128 + 1, (2, 13)).astype(np.int32)
    out = np.asarray(patch_gather_pallas(
        jnp.asarray(img), jnp.asarray(yt), jnp.asarray(xt), 48, 128))
    ref = np.stack([
        [img[b, yt[b, i] * 8:yt[b, i] * 8 + 48,
             xt[b, i] * 128:xt[b, i] * 128 + 128]
         for i in range(13)] for b in range(2)
    ])
    assert np.array_equal(out, ref)
