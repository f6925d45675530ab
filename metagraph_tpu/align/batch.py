"""Lockstep batch wave driver.

Runs many per-read alignment generators (DBGAligner.align_gen) in lockstep:
at every global step, each active read contributes its pending wave of DP
columns; all waves are concatenated (padded to a common band width) and
scored by ONE batched compute_wave call, then the results are scattered back
and every generator advances to its next wave.  Per-read results are
byte-identical to the sequential path — the generators encapsulate all
per-read control flow; only the arithmetic is batched.

This is the TPU-shaped replacement for the reference's per-thread alignment
loop (ref dbg_aligner.cpp:358-385 driven from cli/align.cpp:305): the
device backend jits the wave kernel so one dispatch scores every read's
frontier at once.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .config import NINF
from .wave_extender import compute_wave


def _pad2(a: np.ndarray, width: int, fill) -> np.ndarray:
    if a.shape[1] == width:
        return a
    out = np.full((a.shape[0], width), fill, dtype=a.dtype)
    out[:, : a.shape[1]] = a
    return out


def compute_wave_batch(reqs: List[tuple], backend: str = "numpy"):
    """Serve a list of compute_wave argument tuples with one batched call."""
    if len(reqs) == 1 and backend == "numpy":
        r = reqs[0]
        return [compute_wave(*r)]
    widths = [r[0].shape[1] for r in reqs]
    W = max(widths)
    gap_open, gap_ext = reqs[0][9], reqs[0][10]
    assert all(r[9] == gap_open and r[10] == gap_ext for r in reqs)
    SpM = np.concatenate([_pad2(r[0], W, NINF) for r in reqs])
    SpF = np.concatenate([_pad2(r[1], W, NINF) for r in reqs])
    Fp = np.concatenate([_pad2(r[2], W, NINF) for r in reqs])
    prof = np.concatenate([_pad2(r[3], W, NINF) for r in reqs])
    score = np.concatenate([r[4] for r in reqs])
    has_del = np.concatenate([r[5] for r in reqs])
    band_lo = np.concatenate([r[6] for r in reqs])
    band_hi = np.concatenate([r[7] for r in reqs])
    cutoff = np.concatenate([r[8] for r in reqs])
    if backend == "device":
        S, E, F = _compute_wave_device(SpM, SpF, Fp, prof, score, has_del,
                                       band_lo, band_hi, cutoff, gap_open,
                                       gap_ext)
    else:
        S, E, F = compute_wave(SpM, SpF, Fp, prof, score, has_del, band_lo,
                               band_hi, cutoff, gap_open, gap_ext)
    out = []
    off = 0
    for r, w in zip(reqs, widths):
        n = r[0].shape[0]
        out.append((S[off: off + n, :w], E[off: off + n, :w],
                    F[off: off + n, :w]))
        off += n
    return out


def outgoing_batch_multi(graph, reqs: List[np.ndarray]):
    """Serve many per-read outgoing-edge requests with ONE graph batch op.

    Concatenates the node arrays, calls the graph's vectorized
    call_outgoing_batch once, and splits the (owner, child, char) triples
    back per request (owners ascend, so the split is a searchsorted)."""
    from .wave_extender import _outgoing_batch
    if len(reqs) == 1:
        return [_outgoing_batch(graph, reqs[0])]
    lens = np.array([len(r) for r in reqs], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    own, chd, cde = _outgoing_batch(graph, np.concatenate(reqs))
    cuts = np.searchsorted(own, offs)
    return [(own[cuts[i]: cuts[i + 1]] - offs[i],
             chd[cuts[i]: cuts[i + 1]], cde[cuts[i]: cuts[i + 1]])
            for i in range(len(reqs))]


def drive_batch(gens: List, backend: str = "numpy", graph=None) -> List:
    """Advance alignment generators in lockstep; returns their results.

    Generators yield tagged requests: ("wave", compute_wave args) scored by
    one batched DP call, and ("out", node array) served by one batched graph
    traversal — so both the arithmetic AND the BOSS navigation amortize
    across every active read."""
    results = [None] * len(gens)
    pending = {}
    for i, g in enumerate(gens):
        try:
            pending[i] = g.send(None)
        except StopIteration as st:
            results[i] = st.value
    while pending:
        keys = sorted(pending)
        out_keys = [k for k in keys if pending[k][0] == "out"]
        wave_keys = [k for k in keys if pending[k][0] == "wave"]
        resps = {}
        if out_keys:
            outs = outgoing_batch_multi(graph,
                                        [pending[k][1] for k in out_keys])
            resps.update(zip(out_keys, outs))
        if wave_keys:
            waves = compute_wave_batch([pending[k][1] for k in wave_keys],
                                       backend)
            resps.update(zip(wave_keys, waves))
        next_pending = {}
        for k in keys:
            try:
                next_pending[k] = gens[k].send(resps[k])
            except StopIteration as st:
                results[k] = st.value
        pending = next_pending
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
