"""Ground-truth scan timing with np.asarray fetches (not block_until_ready,
which may not synchronize correctly through the axon tunnel).

Times K chained window_track dispatches ending in one np.asarray fetch of
the final outs, with the sync-only cost subtracted, at bench shapes.
Also times the same with the frame buffer re-uploaded per window
(device_put) to separate H2D cost from device compute.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from snakeslam_tpu.core.camera import Pinhole
from snakeslam_tpu.models.window_step import (
    make_dec_state,
    pack_frames_np,
    window_track,
)
from snakeslam_tpu.ops import matching as M

W = 64
N = 1024
P = 2048
LEVELS = 4
rng = np.random.default_rng(0)


def _mk_lm():
    return M.LocalMapPoints(
        position=jnp.asarray(rng.normal(size=(P, 3)) * 5 + [0, 0, 10],
                             dtype=jnp.float32),
        normal=jnp.asarray(rng.normal(size=(P, 3)), dtype=jnp.float32),
        desc_bits=jnp.asarray(rng.integers(0, 2, (P, 256)), dtype=jnp.int8),
        ref_depth=jnp.asarray(rng.uniform(5, 15, P), dtype=jnp.float32),
        ref_level=jnp.asarray(rng.integers(0, LEVELS, P), dtype=jnp.int32),
        angle=jnp.asarray(rng.uniform(0, 360, P), dtype=jnp.float32),
        valid=jnp.ones((P,), dtype=bool),
    )


def _mk_frame():
    class F:
        n = N
        uv = rng.uniform(0, 700, (N, 2)).astype(np.float32)
        right = rng.uniform(0, 700, N).astype(np.float32)
        octave = rng.integers(0, LEVELS, N).astype(np.float32)
        angle = rng.uniform(0, 360, N).astype(np.float32)
        descriptors = rng.integers(0, 256, (N, 32)).astype(np.uint8)
        timestamp = 0.0
        imu_dR_cam = None
    return F()


def main():
    cam = Pinhole(fx=jnp.float32(458.0), fy=jnp.float32(457.0),
                  cx=jnp.float32(367.0), cy=jnp.float32(248.0))
    bf = jnp.float32(47.9)
    bounds = jnp.asarray([0.0, 0.0, 752.0, 480.0], dtype=jnp.float32)
    scales = jnp.asarray([1.2 ** i for i in range(LEVELS)],
                         dtype=jnp.float32)
    log_sf = jnp.float32(np.log(1.2))
    lm = _mk_lm()
    frames = [_mk_frame() for _ in range(W)]
    buf_np = pack_frames_np(frames, N)
    buf = jax.device_put(buf_np)
    carry0 = (jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32),
              jnp.asarray(make_dec_state(300, 0.0, np.zeros(3),
                                         np.array([0, 0, 1.0]), 10.0, 0)),
              jnp.zeros((), dtype=bool))

    def run(c, b):
        return window_track(
            lm, b, c[0], c[1], c[2], c[3], cam, bf,
            bounds, scales, log_sf, jnp.float32(15.0), jnp.float32(2.0),
            kfi_target=jnp.float32(160.0), is_stereo=jnp.asarray(True),
            th_depth=jnp.float32(25.0), n_valid_frames=jnp.int32(W),
            n_slots=N, two_stage=True, use_imu=False,
        )

    # compile + settle
    out = run(carry0, buf)
    np.asarray(out[0])
    # sync-only cost
    t0 = time.perf_counter()
    np.asarray(out[0])
    sync = time.perf_counter() - t0
    print(f"sync-only: {sync*1e3:.2f} ms", flush=True)

    for K in (1, 4, 16):
        c = carry0
        t0 = time.perf_counter()
        for _ in range(K):
            out = run(c, buf)
            c = out[4]
        np.asarray(out[0])
        wall = time.perf_counter() - t0
        print(f"device-resident buf: K={K:3d} chained windows: "
              f"{wall*1e3:8.1f} ms total, "
              f"{(wall - sync)/ (K*W) * 1e3:7.3f} ms/frame", flush=True)

    # with per-window H2D upload (the runner's real pattern)
    for K in (4, 16):
        c = carry0
        t0 = time.perf_counter()
        for _ in range(K):
            b = jax.device_put(buf_np)
            out = run(c, b)
            c = out[4]
        np.asarray(out[0])
        wall = time.perf_counter() - t0
        print(f"with device_put/window:  K={K:3d} chained windows: "
              f"{wall*1e3:8.1f} ms total, "
              f"{(wall - sync)/(K*W)*1e3:7.3f} ms/frame", flush=True)

    # fetch ALL outputs (outs+assign+vis+fnd) like the runner does
    c = carry0
    K = 8
    t0 = time.perf_counter()
    outs_l = []
    for _ in range(K):
        b = jax.device_put(buf_np)
        out = run(c, b)
        c = out[4]
        outs_l.append(out)
    for o in outs_l:
        for a in o[:4]:
            a.copy_to_host_async()
    for o in outs_l:
        for a in o[:4]:
            np.asarray(a)
    wall = time.perf_counter() - t0
    print(f"full runner pattern (upload+fetch all): K={K} windows: "
          f"{wall*1e3:.1f} ms total, {(wall - sync)/(K*W)*1e3:.3f} ms/frame",
          flush=True)


if __name__ == "__main__":
    main()
