#!/usr/bin/env python
"""Time the aligner's wave DP on the TPU (VERDICT r5 task 6).

Records every compute_wave call (the stacked banded-column recurrence,
ref aligner_extender_methods.cpp:222-261) made while the flat engine
aligns the bench read set, then:

  1. verifies a jax port of the recurrence is bit-identical on every
     recorded wave,
  2. times the per-wave DISPATCH path on the chip (what production would
     pay: one device call per global wave, shapes bucketed), and
  3. times a fused one-dispatch replay (kernel-only throughput; waves are
     sequentially dependent, so this is the arithmetic ceiling, not a
     production mode).

Settles PARITY's aligner story with hardware numbers.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["MG_NO_NATIVE_ALIGN"] = "1"         # force the numpy wave path

import jax
import jax.numpy as jnp

from metagraph_tpu.align import wave_extender
from metagraph_tpu.align.config import NINF


def jax_compute_wave(SpM, SpF, Fp, prof, node_score, has_del, band_lo,
                     band_hi, cut, gap_open: int, gap_ext: int):
    """jax port of wave_extender.compute_wave (int32; the int64 host values
    stay within int32 given the NINF headroom — same argument as the
    native engine)."""
    N, WS = SpM.shape
    ninf = jnp.int32(NINF)
    ns = node_score[:, None]
    M = jnp.full((N, WS), ninf, jnp.int32)
    M = M.at[:, 1:].set(jnp.where(SpM[:, :-1] == ninf, ninf,
                                  SpM[:, :-1] + prof[:, 1:] + ns))
    del_open = jnp.where(SpF == ninf, ninf, SpF + gap_open)
    del_ext = jnp.where(Fp == ninf, ninf, Fp + gap_ext)
    F = jnp.maximum(del_open, del_ext)
    F = jnp.where(F == ninf, ninf, F + ns)
    F = jnp.where(has_del[:, None], F, ninf)
    M = jnp.maximum(M, F)
    E = jnp.full((N, WS), ninf, jnp.int32)
    idx = jnp.arange(WS, dtype=jnp.int32)
    B = M + gap_open - (idx + 1)[None, :] * gap_ext
    run = jax.lax.cummax(B, axis=1)
    idxge = (idx[1:] * gap_ext)[None, :]
    E = E.at[:, 1:].set(jnp.where(run[:, :-1] <= ninf - idxge, ninf,
                                  run[:, :-1] + idxge))
    cutc = cut[:, None]
    S = jnp.maximum(M, E)
    S = jnp.where(S < cutc, ninf, S)
    jjj = jnp.arange(WS, dtype=jnp.int32)
    in_band = (jjj[None, :] >= band_lo[:, None]) \
        & (jjj[None, :] <= band_hi[:, None])
    E = jnp.where(in_band | (S != ninf), E, ninf)
    return S, E, F


def main():
    from metagraph_tpu.seq_io.fasta import read_fasta
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    from metagraph_tpu.align.aligner import DBGAligner
    from metagraph_tpu.align.config import AlignerConfig

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache_bench_graph.npz")
    recs = read_fasta(
        "/root/reference/metagraph/tests/data/transcripts_1000.fa")
    seqs = [r.seq for r in recs]
    g = DBGSuccinct.load(cache)
    import random
    random.seed(42)
    reads = []
    while len(reads) < 480:
        src = random.choice(seqs)
        if len(src) < 200:
            continue
        a = random.randrange(0, len(src) - 150)
        b = bytearray(src[a: a + 150])
        for i in range(len(b)):
            if random.random() < 0.05:
                b[i] = random.choice(b"ACGT")
        reads.append(bytes(b))

    rec = []
    host_dp = [0.0]
    orig = wave_extender.compute_wave

    def recording(*a, **kw):
        t0 = time.perf_counter()
        r = orig(*a, **kw)
        host_dp[0] += time.perf_counter() - t0
        rec.append((a, r))
        return r

    wave_extender.compute_wave = recording
    aligner = DBGAligner(g, AlignerConfig())
    t0 = time.perf_counter()
    res = aligner.align_batch(reads)
    total = time.perf_counter() - t0
    wave_extender.compute_wave = orig
    n_rows = sum(a[0].shape[0] for a, _ in rec)
    print(f"host align_batch (numpy engine): {total:.2f} s "
          f"({len(reads)/total:.0f} reads/s); {len(rec)} waves, "
          f"{n_rows} wave rows, host DP time {host_dp[0]*1e3:.0f} ms")

    # bucketed jit per (Npad, WS) with int32 inputs
    W = rec[0][0][0].shape[1]
    jfn = jax.jit(functools.partial(jax_compute_wave,
                                    gap_open=int(rec[0][0][9]),
                                    gap_ext=int(rec[0][0][10])))

    def bucket(n):
        b = 64
        while b < n:
            b = max(b + 1, int(b * 3) // 2)
        return b

    def pad_args(a):
        (SpM, SpF, Fp, prof, ns, hd, blo, bhi, cut, go, ge) = a
        N = SpM.shape[0]
        Np = bucket(N)
        cut = np.broadcast_to(np.asarray(cut, np.int64), (N,))

        def p2(x, fill):
            out = np.full((Np,) + x.shape[1:], fill, np.int32)
            out[:N] = np.clip(x, NINF, 2**31 - 1)
            return out
        return (p2(SpM, NINF), p2(SpF, NINF), p2(Fp, NINF), p2(prof, 0),
                p2(ns, 0), p2(hd.astype(np.int32), 0).astype(bool),
                p2(blo, 0), p2(bhi, 0), p2(cut, 2**30)), N

    # correctness on a sample of waves + device per-wave dispatch timing
    dev_args = []
    for a, want in rec:
        pa, N = pad_args(a)
        dev_args.append((tuple(jax.device_put(x) for x in pa), N, want))
    ok = True
    for pa, N, want in dev_args[:: max(len(dev_args) // 40, 1)]:
        S, E, F = jfn(*pa)
        for got, w in zip((S, E, F), want):
            if not np.array_equal(np.asarray(got)[:N], w):
                ok = False
    print(f"jax wave == numpy wave on sampled waves: {ok}")

    for pa, _, _ in dev_args[:20]:        # warm compiles per bucket
        _ = jfn(*pa)
    jax.block_until_ready(_)
    t0 = time.perf_counter()
    outs = []
    for pa, _, _ in dev_args:
        outs.append(jfn(*pa)[0])
    jax.block_until_ready(outs)
    dev_seq = time.perf_counter() - t0
    print(f"device wave DP, one dispatch PER WAVE ({len(rec)} waves): "
          f"{dev_seq*1e3:.0f} ms ({dev_seq*1e3/len(rec):.2f} ms/wave) vs "
          f"host numpy DP {host_dp[0]*1e3:.0f} ms")

    # fused replay: all waves stacked in one dispatch (arithmetic ceiling)
    allN = sum(pa[0].shape[0] for pa, _, _ in dev_args)
    catp = [np.concatenate([np.asarray(pa[i]) for pa, _, _ in dev_args])
            for i in range(9)]
    CH = 1 << 12
    padN = (-allN) % CH

    def padc(x):
        return np.concatenate(
            [x, np.repeat(x[:1], padN, axis=0)]) if padN else x
    catp = [padc(x) for x in catp]

    @jax.jit
    def fused(*arrs):
        def body(acc, xs):
            S, E, F = jax_compute_wave(*xs, gap_open=int(rec[0][0][9]),
                                       gap_ext=int(rec[0][0][10]))
            return acc + S.max(), None
        acc, _ = jax.lax.scan(
            body, jnp.int32(0),
            tuple(x.reshape((-1, CH) + x.shape[1:]) for x in arrs))
        return acc

    darrs = [jax.device_put(x) for x in catp]
    _ = int(np.asarray(fused(*darrs)))
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = int(np.asarray(fused(*darrs)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"device wave DP, fused replay ({allN} rows x {W} wide): "
          f"{dt*1e3:.0f} ms = {allN/dt/1e6:.1f} M wave-rows/s "
          f"(host numpy: {n_rows/host_dp[0]/1e6:.1f} M rows/s)")
    eff_total = total - host_dp[0] + dev_seq
    print(f"align (device wave, per-dispatch): effective "
          f"{len(reads)/eff_total:.0f} reads/s vs host-engine path "
          f"(see bench.py aligner rows)")


if __name__ == "__main__":
    main()
