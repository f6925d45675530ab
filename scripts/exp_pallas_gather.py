#!/usr/bin/env python
"""Can a pallas kernel gather rows from a VMEM-resident table faster than
XLA's gather (130M rows/s small-table, 70M rows/s large-table)?

Variants:
  A. fori_loop of dynamic row loads, accumulate into VMEM scratch
  B. jnp.take inside the kernel (mosaic's native gather lowering, if any)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def make_loop_kernel(n_rows, W, QB):
    def kernel(tab_ref, idx_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        def body(i, acc):
            row = tab_ref[pl.ds(idx_ref[i], 1), :]
            return acc + row
        acc = jax.lax.fori_loop(0, QB, body,
                                jnp.zeros((1, W), jnp.uint32))
        out_ref[0:1, :] = out_ref[0:1, :] + acc

    @jax.jit
    def run(tab, idx):
        nblocks = idx.shape[0] // QB
        out = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((n_rows, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((QB,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((8, W), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, W), jnp.uint32),
        )(tab, idx)
        return out[0, 0].astype(jnp.int32)
    return run


def make_take_kernel(n_rows, W, QB):
    def kernel(tab_ref, idx_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        rows = jnp.take(tab_ref[...], idx_ref[...], axis=0)   # (QB, W)
        out_ref[0, :] = out_ref[0, :] + rows.sum(axis=0, dtype=jnp.uint32)

    @jax.jit
    def run(tab, idx):
        nblocks = idx.shape[0] // QB
        out = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((n_rows, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((QB,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, W), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, W), jnp.uint32),
        )(tab, idx)
        return out[0, 0].astype(jnp.int32)
    return run


def main():
    print(f"device: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    Q = 1 << 22
    W = 32                                   # 128 B rows
    for rows_log, QB in ((16, 1 << 10), (17, 1 << 10)):
        n_rows = 1 << rows_log
        tab = rng.integers(0, 2**32, (n_rows, W), dtype=np.uint32)
        idx = rng.integers(0, n_rows, Q).astype(np.int32)
        tab_d = jax.device_put(tab)
        idx_d = jax.device_put(idx)
        for name, maker in (("loop", make_loop_kernel),
                            ("take", make_take_kernel)):
            try:
                run = maker(n_rows, W, QB)
                dt = timeit(run, tab_d, idx_d)
                print(f"pallas {name} rows=2^{rows_log} "
                      f"({n_rows*W*4/1e6:5.1f} MB): {dt*1e3:7.1f} ms "
                      f"{Q/dt/1e6:7.1f} Mgather/s", flush=True)
            except Exception as e:
                print(f"pallas {name} rows=2^{rows_log}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
