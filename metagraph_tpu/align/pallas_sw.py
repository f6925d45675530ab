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


def _sw_kernel(q_ref, r_ref, out_ref, s_ref, f_ref, best_ref, rrot_ref, *,
               match, mismatch, gap_open, gap_ext):
    """One tile: q_ref (B, LQ) int32 codes, r_ref (B, LR) int32 codes,
    out_ref (B, 1) int32 best local score; scoring params are compile-time
    constants (scalar extraction from a VMEM vector is an invalid relayout
    under Mosaic, and the scores never change within a batch anyway).

    Mosaic constraints shape the loop: the lane (minor) dimension cannot be
    dynamically sliced at unaligned offsets, so the reference is consumed by
    rotating it one lane left per step (native TPU lane rotate) and every
    along-query shift is a rotate + iota mask.  DP state lives in VMEM
    scratch refs rather than fori_loop carries — splat-constant carry inits
    are laid out replicated and cannot be rejoined with the loop body's
    concrete layouts ("invalid relayout" at Mosaic compile time).
    """
    q = q_ref[:]                       # (B, LQ)
    B, LQ = q.shape
    LR = r_ref.shape[1]

    # query-axis index, used for the shifts and the max-plus prefix scan of E
    jidx = jax.lax.broadcasted_iota(jnp.int32, (B, LQ), 1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (B, LR), 1)

    def shift_right(x, s, fill):
        # [x0..xn] -> [fill*s, x0..x(n-s)] along lanes (rotate + mask)
        return jnp.where(jidx < s, fill, jnp.roll(x, s, axis=1))

    s_ref[:] = jnp.zeros((B, LQ), jnp.int32)
    f_ref[:] = jnp.full((B, LQ), NEG, jnp.int32)
    best_ref[:] = jnp.zeros((B, 1), jnp.int32)
    rrot_ref[:] = r_ref[:]

    def step(i, _):
        s_prev, f_prev, r_carry = s_ref[:], f_ref[:], rrot_ref[:]
        # broadcast lane 0 of the rotated reference to every query lane
        r_i = jnp.max(jnp.where(ridx == 0, r_carry, NEG), axis=1,
                      keepdims=True)                                # (B, 1)
        sub = jnp.where(q == r_i, match, mismatch)
        sub = jnp.where((q < 0) | (r_i < 0), NEG, sub)
        # shift S_prev right by one along the query axis (prepend 0: local)
        m = shift_right(s_prev, 1, 0) + sub
        f = jnp.maximum(s_prev + gap_open, f_prev + gap_ext)
        sf = jnp.maximum(m, f)
        # E[j] = max_{m<j} (SF[m] + open + (j-m-1)*ext)  (gap opens from SF
        # dominate re-opens from E when open <= ext) — a max-plus prefix
        # scan: E[j] = prefmax(SF[m] - m*ext)[j-1] + open + (j-1)*ext
        c = sf - jidx * gap_ext
        shift = 1
        while shift < LQ:
            c = jnp.maximum(c, shift_right(c, shift, NEG))
            shift *= 2
        prefmax_excl = shift_right(c, 1, NEG)
        e = prefmax_excl + gap_open + (jidx - 1) * gap_ext
        s = jnp.maximum(jnp.maximum(sf, e), 0)
        s_ref[:] = s
        f_ref[:] = f
        best_ref[:] = jnp.maximum(best_ref[:],
                                  jnp.max(s, axis=1, keepdims=True))
        rrot_ref[:] = jnp.roll(r_carry, -1, axis=1)
        return 0

    jax.lax.fori_loop(0, LR, step, 0)
    out_ref[:] = best_ref[:]


def batch_local_align_scores(queries: np.ndarray, refs: np.ndarray,
                             match: int = 2, mismatch: int = -3,
                             gap_open: int = -6, gap_ext: int = -2,
                             interpret: bool | None = None) -> np.ndarray:
    """(B, LQ), (B, LR) int32 code arrays (negative = padding) -> (B,) scores."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, LQ = queries.shape
    LR = refs.shape[1]
    kwargs = {}
    if pltpu is not None and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    if pltpu is not None:
        scratch = [pltpu.VMEM((B, LQ), jnp.int32),
                   pltpu.VMEM((B, LQ), jnp.int32),
                   pltpu.VMEM((B, 1), jnp.int32),
                   pltpu.VMEM((B, LR), jnp.int32)]
    else:  # pragma: no cover - CPU-only install
        scratch = [pl.MemorySpace.ANY((B, LQ), jnp.int32)] * 2 + [
            pl.MemorySpace.ANY((B, 1), jnp.int32),
            pl.MemorySpace.ANY((B, LR), jnp.int32)]
    kern = functools.partial(_sw_kernel, match=int(match),
                             mismatch=int(mismatch), gap_open=int(gap_open),
                             gap_ext=int(gap_ext))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(jnp.asarray(queries, jnp.int32), jnp.asarray(refs, jnp.int32))
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
