"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from snakeslam_tpu.core import lie
from snakeslam_tpu.ops.descriptors import unpack_bits_np, hamming_np
from snakeslam_tpu.parallel import multichip as MC


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_hamming_matches_local(rng):
    mesh = MC.make_mesh()
    pbits = rng.integers(0, 2, size=(1024, 256)).astype(np.int8)
    fbits = rng.integers(0, 2, size=(512, 256)).astype(np.int8)
    fn = MC.sharded_hamming_topk(mesh)
    d, idx = fn(jnp.asarray(pbits), jnp.asarray(fbits))
    # oracle
    H = (pbits[:, None, :] != fbits[None, :, :]).sum(axis=2)
    assert (np.asarray(d) == H.min(axis=1)).all()
    assert (H[np.arange(1024), np.asarray(idx)] == H.min(axis=1)).all()


def test_sharded_ba_step_converges(rng):
    # reuse the BA test problem builder
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "tba", __file__.replace("test_multichip", "test_ba")
    )
    tba = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tba)

    problem, cams_true, pts_true, _ = tba._make_ba_problem(
        rng, C=8, P=256, M=8, noise_px=0.0
    )
    # cast to f32 (device dtype) for the sharded path
    import jax.numpy as jnp
    from snakeslam_tpu.ops.ba import BAProblem

    problem = BAProblem(*[
        (v.astype(jnp.float32) if v.dtype.kind == "f" else v)
        for v in problem
    ])
    mesh = MC.make_mesh()
    from snakeslam_tpu.core.camera import Pinhole

    cam = Pinhole.create(458.654, 457.296, 367.215, 248.375)
    step = MC.sharded_ba_step(mesh, cam, jnp.float32(458.654 * 0.11),
                              n_iters=5, lam=1e-6)
    sharded = MC.shard_problem(problem, mesh)
    cam_pose, points = step(sharded)
    errs = tba._cam_errs(np.asarray(cam_pose), cams_true)
    assert errs.max() < 1e-3
    assert np.abs(np.asarray(points) - pts_true).max() < 1e-2
