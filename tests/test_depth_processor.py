"""Depth-map preprocessing (DepthProcessor2 parity): hysteresis + blur."""

import numpy as np

from snakeslam_tpu.frontend.depth_processor import DepthProcessor


def _scene(H=64, W=96, z_near=2.0, z_far=4.0):
    """Two fronto-parallel planes with a sharp depth edge at W//2."""
    depth = np.full((H, W), z_near, dtype=np.float32)
    depth[:, W // 2:] = z_far
    return depth


def test_flying_pixels_removed():
    rng = np.random.default_rng(0)
    depth = _scene()
    proc = DepthProcessor(fx=500.0, bf=50.0)
    # isolated spikes far from any surface (flying pixels); keep them on a
    # sparse grid so no two spikes are adjacent (a 2-pixel cluster at a
    # common depth is indistinguishable from a tiny surface)
    ys = np.arange(6, 58, 8) + rng.integers(0, 3, size=7)
    xs = np.arange(6, 38, 5)[:7] + rng.integers(0, 2, size=7)
    depth[ys, xs] = 10.0
    out = proc.process(depth)
    assert np.all(out[ys, xs] == 0.0), "flying pixels must be cleared"
    # the surrounding surface survives
    assert (out > 0).mean() > 0.9


def test_smoothing_reduces_noise_preserves_edge():
    rng = np.random.default_rng(1)
    depth = _scene()
    # quantization-scale noise: dz = z^2/bf with bf=50 -> ~0.08 @ z=2
    noise = rng.normal(scale=0.02, size=depth.shape).astype(np.float32)
    noisy = depth + noise
    proc = DepthProcessor(fx=500.0, bf=50.0, gauss_radius=2)
    out = proc.process(noisy)
    interior = (slice(8, 56), slice(8, 40))
    in_rms = np.sqrt(np.mean((noisy[interior] - 2.0) ** 2))
    out_rms = np.sqrt(np.mean((out[interior] - 2.0) ** 2))
    assert out_rms < 0.5 * in_rms, (in_rms, out_rms)
    # the depth edge stays sharp: no mixed depths between the two planes
    mid = out[8:56, 40:56]
    mixed = (mid > 2.3) & (mid < 3.7) & (mid > 0)
    assert mixed.mean() < 0.02, "edge must not be smeared"


def test_invalid_input_stays_invalid():
    depth = _scene()
    depth[10:20, 10:20] = 0.0  # sensor holes
    proc = DepthProcessor(fx=500.0, bf=50.0)
    out = proc.process(depth)
    assert np.all(out[10:20, 10:20][depth[10:20, 10:20] <= 0] == 0.0)
