"""H2D transfer cost through the axon tunnel: latency vs bandwidth.

Times device_put of various sizes (sync'd via a tiny dependent reduce
fetch), plus whether uploads overlap compute.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def upload_time(nbytes, reps=6):
    x = np.zeros(nbytes // 4, dtype=np.float32)
    f = jax.jit(lambda a: jnp.sum(a[::4096]))
    np.asarray(f(jax.device_put(x)))  # compile
    ts = []
    for _ in range(reps):
        x += 1.0  # defeat any caching
        t0 = time.perf_counter()
        d = jax.device_put(x)
        np.asarray(f(d))
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.median(ts))


def main():
    for kb in (4, 64, 512, 3400, 13600):
        best, med = upload_time(kb * 1024)
        print(f"upload {kb:6d} KB: best {best*1e3:7.2f} ms  "
              f"med {med*1e3:7.2f} ms  "
              f"({kb/1024/max(best,1e-9):6.1f} MB/s best)", flush=True)

    # does H2D overlap with device compute? dispatch a long matmul chain,
    # then device_put while it runs, then fetch.
    a = jax.device_put(np.random.default_rng(0)
                       .normal(size=(4096, 4096)).astype(np.float32))

    @jax.jit
    def burn(a):
        def body(c, _):
            return c @ a * (1.0 / 4096.0), None
        return jax.lax.scan(body, a, None, length=40)[0]

    np.asarray(burn(a)[0, 0])  # compile
    t0 = time.perf_counter()
    out = burn(a)
    np.asarray(out[0, 0])
    burn_s = time.perf_counter() - t0
    print(f"burn alone: {burn_s*1e3:.1f} ms", flush=True)

    x = np.ones(3400 * 256, dtype=np.float32)
    t0 = time.perf_counter()
    out = burn(a)
    d = jax.device_put(x)
    s = jnp.sum(d[::4096]) + out[0, 0]
    np.asarray(s)
    both_s = time.perf_counter() - t0
    print(f"burn + 3.4MB upload interleaved: {both_s*1e3:.1f} ms "
          f"(overlap {'YES' if both_s < burn_s * 1.3 else 'NO'})", flush=True)


if __name__ == "__main__":
    main()
