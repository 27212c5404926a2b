"""End-to-end + per-stage timing of extract_orb_batch on the TPU.

Honest protocol: every rep gets a DIFFERENT input array (the remote-TPU
runtime can elide repeated identical dispatches), and both a pipelined
(queue-saturating, one sync) and a per-call-sync latency number are
reported.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_orb_e2e.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from snakeslam_tpu.ops import orb as O


def timeit_varied(fn, inputs, label):
    """inputs: list of distinct arg-tuples, one per rep."""
    out = fn(*inputs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for a in inputs:
        out = fn(*a)
    jax.block_until_ready(out)
    pipe = (time.perf_counter() - t0) / len(inputs) * 1e3
    t0 = time.perf_counter()
    for a in inputs[:4]:
        jax.block_until_ready(fn(*a))
    sync = (time.perf_counter() - t0) / 4 * 1e3
    print(f"{label}: pipelined {pipe:.2f} ms, per-call-sync {sync:.2f} ms")
    return pipe


def main():
    B, H, W = 8, 480, 752
    reps = 12
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(B, H, W)).astype(np.float32)
    imgs_l = [jnp.asarray(np.roll(base, k, axis=2)) for k in range(reps)]
    jax.block_until_ready(imgs_l)

    full = jax.jit(lambda b: O.extract_orb_batch(b, n_features=1024))
    ms = timeit_varied(full, [(x,) for x in imgs_l], "extract_orb_batch")
    print(f"  -> {8 / ms * 1000:.0f} FPS (pipelined)")

    use_pallas = jax.default_backend() not in ("cpu", "gpu")
    if use_pallas:
        from snakeslam_tpu.ops.orb_pallas import fast_score_pallas_batch
        fast = jax.jit(lambda b: fast_score_pallas_batch(b, 20.0)[0])
    else:
        fast = jax.jit(
            lambda b: jax.vmap(lambda im: O.fast_score(im, 20.0))(b)[0])
    timeit_varied(fast, [(x,) for x in imgs_l], "fast_score")

    nms = jax.jit(jax.vmap(O.nms3))
    scores = [fast(x) for x in imgs_l]
    jax.block_until_ready(scores)
    timeit_varied(nms, [(s,) for s in scores], "nms3")

    nscores = [nms(s) for s in scores]
    jax.block_until_ready(nscores)
    sel = jax.jit(jax.vmap(lambda s: O.select_keypoints(s, 400)))
    timeit_varied(sel, [(s,) for s in nscores], "select_keypoints")

    uvs = [sel(s)[0] for s in nscores]
    jax.block_until_ready(uvs)
    ob = jax.jit(jax.vmap(O.orient_and_brief))
    timeit_varied(ob, list(zip(imgs_l, uvs)), "orient_and_brief")

    rs = jax.jit(lambda b: O._resize_matmul(b, 400, 627))
    timeit_varied(rs, [(x,) for x in imgs_l], "resize level1")


if __name__ == "__main__":
    main()
