#!/usr/bin/env python
"""Round-5 design probes for the dedup epoch (VERDICT r5 task 1).

Measures on the live chip:
  1. row-gather issue rate vs SOURCE TABLE SIZE (does gathering from a
     compact per-batch array beat gathering from the full index?)
  2. lax.sort cost at workload size (device-side dedup feasibility)
  3. scatter-add cost (segment-sum feasibility)
  4. host->device upload bandwidth (did-tile upload feasibility)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _force(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return int(np.asarray(leaf).reshape(-1)[:1][0])


def timeit(fn, *args, reps=3, warm=2):
    for _ in range(warm):
        r = fn(*args)
    _force(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        _force(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print(f"device: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    Q = 1 << 22                      # 4.2M accesses

    # ---- 1. gather rate vs table rows (fixed 128B rows = bench anno width)
    print("\n-- gather rate vs table size (width 32 words = 128 B) --")
    idx_base = rng.integers(0, 1 << 30, Q).astype(np.uint32)
    for rows_log in (12, 14, 16, 19, 22):
        n_rows = 1 << rows_log
        tab = rng.integers(0, 2**32, (n_rows, 32), dtype=np.uint32)
        tab_d = jax.device_put(tab)
        idx_d = jax.device_put((idx_base % n_rows).astype(np.int32))

        @jax.jit
        def run(t, i):
            def body(acc, ii):
                rows = t[ii]
                return acc ^ jax.lax.reduce(
                    rows, np.uint32(0), jax.lax.bitwise_xor, (0,)), None
            acc0 = jnp.zeros((t.shape[1],), jnp.uint32)
            acc, _ = jax.lax.scan(body, acc0, i.reshape(-1, 1 << 17))
            return acc.astype(jnp.int32).sum()

        dt = timeit(run, tab_d, idx_d)
        print(f"rows=2^{rows_log:2d} ({n_rows*128/1e6:7.1f} MB): "
              f"{dt*1e3:7.1f} ms  {Q/dt/1e6:7.1f} Mgather/s")

    # ---- 2. device sort cost (3-operand, 2 key words) at 6M
    print("\n-- lax.sort cost (hi,lo keys + 1 payload) --")
    for n_log in (21, 23):
        n = 1 << n_log
        hi = rng.integers(0, 2**32, n, dtype=np.uint32)
        lo = rng.integers(0, 2**32, n, dtype=np.uint32)
        pay = np.arange(n, dtype=np.int32)

        @jax.jit
        def dsort(a, b, c):
            sa, sb, sc = jax.lax.sort((a, b, c), num_keys=2)
            return sa[0].astype(jnp.int32) + sc[-1]

        dt = timeit(dsort, jax.device_put(hi), jax.device_put(lo),
                    jax.device_put(pay))
        print(f"n=2^{n_log}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.1f} Melem/s")

    # ---- 3. scatter-add cost: Q adds into (S, L) f32
    print("\n-- scatter-add Q x (128B rows) into 2^19-row table --")
    tgt_rows = 1 << 19
    sidx = (idx_base % tgt_rows).astype(np.int32)
    vals = rng.standard_normal((Q, 1), dtype=np.float32)

    @jax.jit
    def scat(i, v):
        z = jnp.zeros((tgt_rows, 32), jnp.float32)
        def body(acc, x):
            ii, vv = x
            return acc.at[ii].add(vv), None
        acc, _ = jax.lax.scan(
            body, z, (i.reshape(-1, 1 << 17), v.reshape(-1, 1 << 17, 1)))
        return acc.sum()

    dt = timeit(scat, jax.device_put(sidx), jax.device_put(vals))
    print(f"scatter-add: {dt*1e3:7.1f} ms  {Q/dt/1e6:7.1f} Mscatter/s")

    # ---- 4. upload bandwidth
    print("\n-- host->device upload --")
    for mb in (1, 8, 32):
        arr = rng.integers(0, 2**32, (mb << 20) // 4, dtype=np.uint32)
        # warm
        _ = jax.device_put(arr[:1024]).block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(arr)
            d.block_until_ready()
            ts.append(time.perf_counter() - t0)
            del d
        dt = min(ts)
        print(f"{mb:3d} MB: {dt*1e3:7.1f} ms  {mb/dt/1e3:6.2f} GB/s")


if __name__ == "__main__":
    main()
