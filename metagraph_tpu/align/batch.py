"""Lockstep batch alignment driver.

Runs many per-read alignment generators (DBGAligner.align_gen) in lockstep
at EXTENSION granularity: each generator yields ("extend", job) requests;
the driver collects one job per active read and runs them all concurrently
through the flat wave engine (flat.py) — one stacked column-DP call and one
batched graph-traversal call per global wave, across every read's current
extension.  Per-read results are byte-identical to the sequential path: the
generators encapsulate all per-read control flow (seed order, aggregator
cutoffs, convergence-filter reuse across seeds).

This is the TPU-shaped replacement for the reference's per-thread alignment
loop (ref dbg_aligner.cpp:358-385 driven from cli/align.cpp:305).
"""

from __future__ import annotations

from typing import List

import numpy as np

from .config import NINF
from .flat import make_engine, _group_key


def drive_batch(gens: List, backend: str = "numpy", graph=None,
                max_window: int = 0) -> List:
    """Advance alignment generators with continuous batching; returns their
    results.

    Generators yield ("extend", (extender, seed, min_path_score,
    force_fixed_seed)) requests.  Every pending extension — across all
    reads — runs in ONE shared flat-engine wave pool; when a read's
    extension completes, its generator resumes immediately and its next
    extension joins the pool mid-flight, so the pool stays dense instead of
    draining round by round (the continuous-batching analog of the
    reference's work-stealing thread pool, ref dbg_aligner.cpp:358-385)."""
    results = [None] * len(gens)
    engines = {}
    owner = {}                  # (group key, slot) -> generator index

    def get_engine(ext, seed):
        key = _group_key(ext)
        eng = engines.get(key)
        if eng is None:
            W = max(max_window,
                    len(ext.query) - seed.get_clipping() + 1)
            eng = make_engine(ext.graph, ext.config, ext.profile_chars,
                              ext.char_idx, W, backend)
            engines[key] = eng
        return eng, key

    def feed(i, value):
        """Resume generator i with ``value``; admit its next job (looping
        over empty-seed requests, which resolve to [] synchronously)."""
        while True:
            try:
                tag, req = gens[i].send(value)
            except StopIteration as st:
                results[i] = st.value
                return
            assert tag == "extend"
            ext, seed, mps, ffs = req
            if seed.empty():
                value = []
                continue
            eng, key = get_engine(ext, seed)
            owner[(key, eng.add_job(ext, seed, mps, ffs))] = i
            return

    for i in range(len(gens)):
        feed(i, None)
    while True:
        ran = False
        for key, eng in engines.items():
            if not eng.active:
                continue
            ran = True
            for slot in eng.step():
                feed(owner.pop((key, slot)), eng.finalize(slot))
        if not ran:
            break
    return results


# ---------------------------------------------------------------- device
_DEV_NEG = -(2 ** 29)          # kernel-local NINF (int32-safe headroom)
_dev_fns = {}


def _compute_wave_device(SpM, SpF, Fp, prof, score, has_del, band_lo,
                         band_hi, cutoff, gap_open, gap_ext):
    """compute_wave on the accelerator: int32 with a shifted NINF (the host
    NINF is INT32_MIN+100; arithmetic on it needs int64, so the kernel maps
    NINF -> -2^29 where int32 headroom suffices).  Shapes are bucketed
    (rows to the next power of two) to bound recompiles."""
    import jax
    import jax.numpy as jnp

    N, W = SpM.shape
    Np = 1 << int(np.ceil(np.log2(max(N, 8))))
    key = (Np, W)
    if key not in _dev_fns:
        import functools

        @functools.partial(jax.jit, static_argnums=(9, 10))
        def kern(SpM, SpF, Fp, prof, score, has_del, band_lo, band_hi,
                 cutoff, go, ge):
            NEG = _DEV_NEG
            ns = score[:, None]
            M = jnp.full(SpM.shape, NEG, jnp.int32)
            M = M.at[:, 1:].set(jnp.where(SpM[:, :-1] <= NEG, NEG,
                                          SpM[:, :-1] + prof[:, 1:] + ns))
            del_open = jnp.where(SpF <= NEG, NEG, SpF + go)
            del_ext = jnp.where(Fp <= NEG, NEG, Fp + ge)
            F = jnp.maximum(del_open, del_ext)
            F = jnp.where(F <= NEG, NEG, F + ns)
            F = jnp.where(has_del[:, None], F, NEG)
            M = jnp.maximum(M, F)
            idx = jnp.arange(SpM.shape[1], dtype=jnp.int32)
            B = M + go - (idx + 1)[None, :] * ge
            run = jax.lax.associative_scan(jnp.maximum, B, axis=1)
            E = jnp.full(SpM.shape, NEG, jnp.int32)
            Ev = run[:, :-1] + (idx[1:] * ge)[None, :]
            E = E.at[:, 1:].set(jnp.where(Ev <= NEG, NEG, Ev))
            S = jnp.maximum(M, E)
            S = jnp.where(S < cutoff[:, None], NEG, S)
            in_band = (idx[None, :] >= band_lo[:, None]) \
                & (idx[None, :] <= band_hi[:, None])
            E = jnp.where(in_band | (S > NEG), E, NEG)
            return S, E, F
        _dev_fns[key] = kern

    def enc(a):
        a32 = np.where(a == NINF, _DEV_NEG, a).astype(np.int32)
        if len(a32) < Np:
            pad = np.full((Np - len(a32),) + a32.shape[1:], _DEV_NEG,
                          np.int32)
            a32 = np.concatenate([a32, pad])
        return a32

    def enc1(a, fill=0):
        a32 = np.asarray(a).astype(np.int32)
        if len(a32) < Np:
            a32 = np.concatenate(
                [a32, np.full(Np - len(a32), fill, np.int32)])
        return a32

    cut32 = enc1(np.where(np.asarray(cutoff) == NINF + 1, _DEV_NEG + 1,
                          cutoff))
    S, E, F = _dev_fns[(Np, W)](
        enc(SpM), enc(SpF), enc(Fp), enc(prof), enc1(score),
        np.concatenate([np.asarray(has_del, bool),
                        np.zeros(Np - N, bool)]) if N < Np
        else np.asarray(has_del, bool),
        enc1(band_lo), enc1(band_hi, fill=0), cut32, int(gap_open),
        int(gap_ext))

    def dec(a):
        a = np.asarray(a[:N], dtype=np.int64)
        return np.where(a <= _DEV_NEG, NINF, a)
    return dec(S), dec(E), dec(F)
