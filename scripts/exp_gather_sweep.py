#!/usr/bin/env python
"""Micro-sweep: TPU row-gather throughput vs (table rows, row width).

Builds the gather-issue cost model behind the fused epoch's roofline
(VERDICT r4: the epoch is gather-ISSUE bound, not HBM-byte bound).
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


def timeit(fn, *args, reps=4, warm=2):
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
    Q = 1 << 22                    # 4.2M gathers
    rng = np.random.default_rng(0)

    for n_rows_log in (19,):
        n_rows = 1 << n_rows_log
        idx = rng.integers(0, n_rows, Q).astype(np.int32)
        idx_d = jax.device_put(idx)
        for wwords in (8, 32, 128, 256):
            tab = rng.integers(0, 2**32, (n_rows, wwords),
                               dtype=np.uint32)
            tab_d = jax.device_put(tab)

            @jax.jit
            def run(t, i):
                # xor-fold the gathered rows so nothing is DCEd
                def body(acc, ii):
                    rows = t[ii]
                    return acc ^ jax.lax.reduce(
                        rows, np.uint32(0), jax.lax.bitwise_xor, (0,)), None
                acc0 = jnp.zeros((t.shape[1],), jnp.uint32)
                acc, _ = jax.lax.scan(body, acc0,
                                      i.reshape(-1, 1 << 17))
                return acc.astype(jnp.int32).sum()

            dt = timeit(run, tab_d, idx_d)
            gps = Q / dt
            gbs = Q * wwords * 4 / dt / 1e9
            print(f"rows=2^{n_rows_log} width={wwords*4:5d}B: "
                  f"{dt*1e3:7.1f} ms  {gps/1e6:7.1f} Mgather/s "
                  f"{gbs:6.1f} GB/s")


if __name__ == "__main__":
    main()
