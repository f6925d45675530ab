import time, numpy as np, jax, jax.numpy as jnp
x = np.random.randint(0, 2**32, size=(1<<19,), dtype=np.uint32)  # 2 MB
f = jax.jit(lambda a: a.sum())
_ = f(jnp.asarray(x)).block_until_ready()
for sz in [1<<19, 1<<21, 1<<23]:
    x = np.random.randint(0, 2**32, size=(sz,), dtype=np.uint32)
    t0=time.perf_counter(); d = jax.device_put(x); d.block_until_ready(); t1=time.perf_counter()
    r = f(d); _=np.asarray(r); t2=time.perf_counter()
    # download
    y = jax.jit(lambda a: a + 1)(d); y.block_until_ready()
    t3=time.perf_counter(); h = np.asarray(y); t4=time.perf_counter()
    mb = sz*4/1e6
    print(f"{mb:.0f} MB: upload {1e3*(t1-t0):.0f} ms ({mb/(t1-t0):.0f} MB/s), reduce {1e3*(t2-t1):.0f} ms, download {1e3*(t4-t3):.0f} ms ({mb/(t4-t3):.0f} MB/s)")
# dispatch latency
g = jax.jit(lambda a: a * 2)
small = jnp.ones((8,), jnp.float32); _=np.asarray(g(small))
ts=[]
for _ in range(10):
    t0=time.perf_counter(); _=np.asarray(g(small)); ts.append(time.perf_counter()-t0)
print("small roundtrip dispatch:", [f"{t*1e3:.0f}" for t in ts], "ms")
