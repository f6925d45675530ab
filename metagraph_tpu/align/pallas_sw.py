"""Pallas TPU kernel: batched affine-gap local alignment (Smith-Waterman).

The compute core of seed extension (the reference's simde-SSE inner loop,
ref aligner_extender_methods.cpp:209-290) as a TPU kernel: a whole batch of
(query, reference) pairs is scored in one kernel launch.  Each grid step
processes a tile of pairs; the DP recurrence marches down the reference with
the query dimension vectorized across VPU lanes:

    M[j] = max(0, S_prev[j-1] + subst(q[j], r_i))
    E[j] = max(S[j-1] + gap_open, E[j-1] + gap_ext)   (along-query, rolled)
    F[j] = max(S_prev[j] + gap_open, F_prev[j] + gap_ext)
    S[j] = max(M[j], E[j], F[j]);  best = max(best, S)

Used for batch rescoring / filtering of candidate alignments; the
graph-tree extender (host) remains the exact-backtrack path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
try:  # TPU backend only; CPU tests run with interpret=True
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

NEG = -(2 ** 30)


def _sw_kernel(q_ref, r_ref, params_ref, out_ref):
    """One tile: q_ref (B, LQ) int32 codes, r_ref (B, LR) int32 codes,
    params_ref (1, 8) int32 [match, mismatch, gap_open, gap_ext, LQ, LR, ...],
    out_ref (B, 1) int32 best local score."""
    match = params_ref[0, 0]
    mismatch = params_ref[0, 1]
    gap_open = params_ref[0, 2]
    gap_ext = params_ref[0, 3]

    q = q_ref[:]                       # (B, LQ)
    B, LQ = q.shape
    LR = r_ref.shape[1]

    # query-axis index, used for the max-plus prefix scan of E
    jidx = jax.lax.broadcasted_iota(jnp.int32, (B, LQ), 1)

    def step(i, carry):
        s_prev, f_prev, best = carry
        r_i = r_ref[:, pl.ds(i, 1)]                                 # (B, 1)
        sub = jnp.where(q == r_i, match, mismatch)
        sub = jnp.where((q < 0) | (r_i < 0), NEG, sub)
        # shift S_prev right by one along the query axis (prepend 0: local)
        s_shift = jnp.pad(s_prev[:, :-1], ((0, 0), (1, 0)))
        m = s_shift + sub
        f = jnp.maximum(s_prev + gap_open, f_prev + gap_ext)
        sf = jnp.maximum(m, f)
        # E[j] = max_{m<j} (SF[m] + open + (j-m-1)*ext)  (gap opens from SF
        # dominate re-opens from E when open <= ext) — a max-plus prefix
        # scan: E[j] = prefmax(SF[m] - m*ext)[j-1] + open + (j-1)*ext
        c = sf - jidx * gap_ext
        shift = 1
        while shift < LQ:
            c = jnp.maximum(
                c, jnp.pad(c[:, :-shift], ((0, 0), (shift, 0)),
                           constant_values=NEG))
            shift *= 2
        prefmax_excl = jnp.pad(c[:, :-1], ((0, 0), (1, 0)),
                               constant_values=NEG)
        e = prefmax_excl + gap_open + (jidx - 1) * gap_ext
        s = jnp.maximum(jnp.maximum(sf, e), 0)
        best = jnp.maximum(best, jnp.max(s, axis=1, keepdims=True))
        return s, f, best

    init = (jnp.zeros((B, LQ), jnp.int32),
            jnp.full((B, LQ), NEG, jnp.int32),
            jnp.zeros((B, 1), jnp.int32))
    _, _, best = jax.lax.fori_loop(0, LR, step, init)
    out_ref[:] = best


def batch_local_align_scores(queries: np.ndarray, refs: np.ndarray,
                             match: int = 2, mismatch: int = -3,
                             gap_open: int = -6, gap_ext: int = -2,
                             interpret: bool | None = None) -> np.ndarray:
    """(B, LQ), (B, LR) int32 code arrays (negative = padding) -> (B,) scores."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, LQ = queries.shape
    LR = refs.shape[1]
    params = np.array([[match, mismatch, gap_open, gap_ext, LQ, LR, 0, 0]],
                      dtype=np.int32)
    kwargs = {}
    if pltpu is not None and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    out = pl.pallas_call(
        _sw_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        interpret=interpret,
        **kwargs,
    )(jnp.asarray(queries, jnp.int32), jnp.asarray(refs, jnp.int32), params)
    return np.asarray(out)[:, 0]


def reference_local_align_score(q, r, match=2, mismatch=-3, gap_open=-6,
                                gap_ext=-2) -> int:
    """numpy oracle for the kernel (plain O(LQ*LR) Gotoh local alignment)."""
    LQ, LR = len(q), len(r)
    S = np.zeros(LQ + 1, dtype=np.int64)
    F = np.full(LQ + 1, NEG, dtype=np.int64)
    best = 0
    for i in range(LR):
        S_new = np.zeros(LQ + 1, dtype=np.int64)
        E = NEG
        for j in range(1, LQ + 1):
            sub = match if q[j - 1] == r[i] and q[j - 1] >= 0 and r[i] >= 0 \
                else (NEG if q[j - 1] < 0 or r[i] < 0 else mismatch)
            F[j] = max(S[j] + gap_open, F[j] + gap_ext)
            E = max(S_new[j - 1] + gap_open, E + gap_ext)
            S_new[j] = max(0, S[j - 1] + sub, E, F[j])
            best = max(best, S_new[j])
        S = S_new
    return int(best)
