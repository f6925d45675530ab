#!/usr/bin/env python
"""Probe-gather cost vs hash bucket width on the TPU (same key set)."""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_table(keys, ids, bucket, load):
    from metagraph_tpu.succinct.ops import _hash_words, EMPTY_WORD
    N, W = keys.shape
    n_buckets = max(2, int(2 ** np.ceil(np.log2(max(N, 1) / (bucket * load)))))
    while True:
        table = np.full((n_buckets, bucket, W + 1), EMPTY_WORD, dtype=np.uint32)
        fill = np.zeros(n_buckets, dtype=np.int32)
        remaining = np.arange(N)
        h = _hash_words(keys, n_buckets, 1)
        ok_all = True
        for _ in range(bucket):
            if remaining.size == 0:
                break
            hh = h[remaining]
            order = np.argsort(hh, kind="stable")
            s = hh[order]
            first = np.ones(len(s), dtype=bool)
            first[1:] = s[1:] != s[:-1]
            cand = order[first]
            b = hh[cand]
            okk = fill[b] < bucket
            cand, b = cand[okk], b[okk]
            table[b, fill[b], :W] = keys[remaining[cand]]
            table[b, fill[b], W] = ids[remaining[cand]]
            fill[b] += 1
            placed = np.zeros(len(remaining), dtype=bool)
            placed[cand] = True
            remaining = remaining[~placed]
        if remaining.size:
            n_buckets *= 2
            continue
        return table.reshape(n_buckets, bucket * (W + 1))


def main():
    import jax
    import jax.numpy as jnp
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    from metagraph_tpu.succinct import ops as graph_ops
    from metagraph_tpu.succinct.ops import _hash_words

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache_bench_graph.npz")
    g = DBGSuccinct.load(cache)
    boss = g.boss
    valid_edges = np.flatnonzero(boss.valid)
    kchars = boss.get_edge_seq(valid_edges)
    keys = graph_ops.pack_kmers32(kchars)
    ids = valid_edges.astype(np.uint32)
    N, W = keys.shape

    rng = np.random.default_rng(0)
    Q = 1 << 23                               # 8.4M probes
    qidx = rng.integers(0, N, Q)
    queries = keys[qidx]

    C = 1 << 17
    nc = Q // C

    for bucket, load in [(8, 0.45), (16, 0.45), (32, 0.45), (32, 0.8),
                         (64, 0.8), (128, 0.8)]:
        flat = build_table(keys, ids, bucket, load)
        nb = flat.shape[0]
        dt = jax.device_put(jnp.asarray(flat))

        @functools.partial(jax.jit, static_argnums=(2,))
        def probe_all(tab, qs, bkt):
            def body(acc, q):
                b = _hash_words(q, tab.shape[0], 1)
                rows = tab[b].reshape(C, bkt, W + 1)
                eq = jnp.all(rows[:, :, :W] == q[:, None, :], axis=-1)
                hit = jnp.any(eq, axis=-1)
                idsv = jnp.max(jnp.where(eq, rows[:, :, W], 0),
                               axis=-1).astype(jnp.int32)
                nodes = jnp.where(hit, idsv, 0)
                return acc + nodes.sum(), None
            acc, _ = jax.lax.scan(body, jnp.int32(0),
                                  qs.reshape(nc, C, W))
            return acc

        ts = []
        for rep in range(3):
            qs = jax.device_put(jnp.asarray(np.roll(queries, rep, axis=0)))
            jax.block_until_ready(qs)
            t0 = time.perf_counter()
            r = probe_all(dt, qs, bucket)
            _ = int(np.asarray(r))
            ts.append(time.perf_counter() - t0)
        row_b = bucket * (W + 1) * 4
        print(f"bucket={bucket:3d} load={load} nb={nb:7d} row={row_b:5d}B "
              f"table={flat.nbytes/1e6:6.1f}MB  probe {Q/1e6:.1f}M: "
              f"{min(ts[1:])*1e3:6.1f} ms  ({[f'{x*1e3:.0f}' for x in ts]})",
              flush=True)


if __name__ == "__main__":
    main()
