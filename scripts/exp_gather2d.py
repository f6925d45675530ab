#!/usr/bin/env python
"""Round-5 gather-surface sweep with a NON-DISTORTING consume.

r4's exp_gather_sweep used an xor lax.reduce consume which itself dominates
at small widths (measured: 'anno gather only' stage showed 168 ms standalone
vs ~86 ms in the fused epoch).  Here the consume is a running uint32 sum into
a (W,) accumulator — one cheap vectorized add per gathered element.

Sweeps (rows x width) to find the overfetch-optimal annotation row packing
(query/device.py anno layout, _PACK_TARGET_WORDS) and bucket row size.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _force(r):
    return int(np.asarray(r).reshape(-1)[:1][0])


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


def run_config(rng, n_rows, wwords, Q):
    tab = rng.integers(0, 2**32, (n_rows, wwords), dtype=np.uint32)
    idx = rng.integers(0, n_rows, Q).astype(np.int32)
    tab_d = jax.device_put(tab)
    idx_d = jax.device_put(idx)

    @jax.jit
    def run(t, i):
        def body(acc, ii):
            rows = t[ii]                       # (chunk, W)
            return acc + rows.sum(axis=0, dtype=jnp.uint32), None
        acc0 = jnp.zeros((t.shape[1],), jnp.uint32)
        acc, _ = jax.lax.scan(body, acc0, i.reshape(-1, 1 << 17))
        return jax.lax.bitwise_xor(acc[0], acc[-1]).astype(jnp.int32)

    dt = timeit(run, tab_d, idx_d)
    gps = Q / dt
    gbs = Q * wwords * 4 / dt / 1e9
    print(f"rows=2^{int(np.log2(n_rows)):2d} width={wwords*4:5d}B "
          f"({n_rows*wwords*4/1e6:7.1f} MB): {dt*1e3:7.1f} ms "
          f"{gps/1e6:7.1f} Mgather/s {gbs:6.1f} GB/s", flush=True)


def main():
    print(f"device: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    Q = 1 << 22

    print("\n-- width sweep at rows=2^19 --")
    for ww in (8, 16, 32, 48, 64, 96, 128, 256):
        run_config(rng, 1 << 19, ww, Q)

    print("\n-- row-count sweep at width 256 B (64 w) --")
    for rl in (14, 16, 17, 18, 20):
        run_config(rng, 1 << rl, 64, Q)

    print("\n-- row-count sweep at width 512 B (128 w) --")
    for rl in (14, 16, 17, 18):
        run_config(rng, 1 << rl, 128, Q)


if __name__ == "__main__":
    main()
