import time, numpy as np, jax, jax.numpy as jnp
for mb in (0.1, 0.5, 1, 3.4, 8, 21, 64):
    n = int(mb*1024*1024/4)
    x = np.random.rand(n).astype(np.float32)
    # warm
    jnp.asarray(x[:1024]).block_until_ready()
    ts=[]
    for _ in range(3):
        t0=time.perf_counter()
        jnp.asarray(x).block_until_ready()
        ts.append(time.perf_counter()-t0)
    t=min(ts)
    print(f"H2D {mb:5.1f}MB: {t*1000:7.1f}ms  {mb/t:7.1f} MB/s")
# D2H
y = jnp.zeros(int(3.4*1024*1024/4), dtype=jnp.float32); y.block_until_ready()
for sz_mb, arr in ((0.3, jnp.zeros(80_000, dtype=jnp.float32)), (3.4, y)):
    arr.block_until_ready()
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); np.asarray(arr); ts.append(time.perf_counter()-t0)
    print(f"D2H {sz_mb:5.1f}MB: {min(ts)*1000:7.1f}ms")
# round trip latency
f = jax.jit(lambda a: a+1)
z = jnp.zeros(8); f(z).block_until_ready()
ts=[]
for _ in range(10):
    t0=time.perf_counter(); np.asarray(f(z)); ts.append(time.perf_counter()-t0)
print("RT latency:", [round(t*1000,1) for t in ts])
