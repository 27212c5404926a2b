"""TSDF fusion: a synthetic plane reconstructs at the right depth."""

import numpy as np
import jax.numpy as jnp

from snakeslam_tpu.ops import tsdf as T


def test_plane_reconstruction():
    vol = T.create_volume(resolution=96, extent=3.0, origin=(-1.5, -1.5, 0.0))
    H, W = 120, 160
    fx = fy = 100.0
    cx, cy = W / 2, H / 2
    depth = np.full((H, W), 2.0, dtype=np.float32)  # plane at z = 2

    # fuse from two slightly different poses
    import jax

    from snakeslam_tpu.core import lie

    poses = [np.eye(4)]
    p2 = np.asarray(lie.se3_exp(jnp.asarray(
        [0.05, 0.0, 0.0, 0.0, 0.02, 0.0], dtype=jnp.float64
    )))
    poses.append(p2)
    for T_cw in poses:
        vol = T.integrate(
            vol, jnp.asarray(depth), jnp.asarray(T_cw, dtype=jnp.float32),
            jnp.float32(fx), jnp.float32(fy), jnp.float32(cx),
            jnp.float32(cy), jnp.float32(0.1),
        )
    pts = T.extract_surface_points(vol, iso_band=0.3)
    assert len(pts) > 200
    # the surface sits at z ~ 2 within a voxel
    assert abs(np.median(pts[:, 2]) - 2.0) < 0.1
    spread = np.percentile(pts[:, 2], 95) - np.percentile(pts[:, 2], 5)
    assert spread < 0.25
