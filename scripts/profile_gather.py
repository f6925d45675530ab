#!/usr/bin/env python
"""Gather microbenchmarks on the TPU: cost vs index distribution, row width,
table rows, and scalar un-permute cost."""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    Q = 1 << 23
    C = 1 << 17
    nc = Q // C
    rng = np.random.default_rng(0)

    @functools.partial(jax.jit, static_argnums=(2,))
    def gsum(tab, idx, nothing):
        def body(acc, i):
            return acc + tab[i].sum(dtype=jnp.uint32), None
        acc, _ = jax.lax.scan(body, jnp.uint32(0), idx.reshape(nc, C))
        return acc

    def bench(tab_rows, width, idx, name):
        tab = jnp.asarray(
            rng.integers(0, 2**32, (tab_rows, width), dtype=np.uint32))
        ts = []
        for rep in range(3):
            ix = jax.device_put(jnp.asarray(np.roll(idx, rep)))
            jax.block_until_ready(ix)
            t0 = time.perf_counter()
            r = gsum(tab, ix, width)
            _ = int(np.asarray(r))
            ts.append(time.perf_counter() - t0)
        print(f"{name:34s} rows={tab_rows:8d} w={width:4d}: "
              f"{min(ts[1:])*1e3:7.1f} ms", flush=True)

    uni131 = rng.integers(0, 131072, Q).astype(np.int32)
    bench(131072, 64, uni131, "uniform random (probe-like)")
    bench(131072, 64, np.sort(uni131), "sorted")
    # window-like: runs of ~230 consecutive-ish ids with jumps
    base = rng.integers(0, 131072, Q // 256).astype(np.int64)
    walk = (base[:, None] + rng.integers(-8, 8, (Q // 256, 256)).cumsum(1)
            ) % 131072
    bench(131072, 64, walk.reshape(-1).astype(np.int32), "local walks")
    uni149 = rng.integers(0, 149000, Q).astype(np.int32)
    bench(149000, 128, uni149, "uniform random (anno-like)")
    bench(16384, 64, rng.integers(0, 16384, Q).astype(np.int32),
          "uniform small table")
    # scalar un-permute
    vec = jnp.asarray(rng.integers(0, 2**32, (Q, 1), dtype=np.uint32))
    perm = rng.permutation(Q).astype(np.int32)
    bench(Q, 1, perm, "scalar un-permute (QxQ)")


if __name__ == "__main__":
    main()
