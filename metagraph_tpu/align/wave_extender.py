"""Batched column recurrence + the flat-engine extender front-end.

``compute_wave`` is the stacked DP column kernel (the vectorized form of
extender.py:343-403, ref aligner_extender_methods.cpp:209-290): it scores N
banded columns at full window width in one set of array ops.  The flat
multi-extension engine (flat.py) uses it to score every active extension's
frontier — across all lockstep reads — in one call per global wave.

``WaveExtender`` is a drop-in DefaultColumnExtender whose get_extensions runs
through the flat engine (identical outputs, wave-batched arithmetic).
"""

from __future__ import annotations

from typing import List

import numpy as np

from .alignment import Alignment
from .config import NINF
from .extender import DefaultColumnExtender


def compute_wave(SpM: np.ndarray, SpF: np.ndarray, Fp: np.ndarray,
                 prof: np.ndarray, node_score: np.ndarray,
                 has_del: np.ndarray, band_lo: np.ndarray,
                 band_hi: np.ndarray, xdrop_cutoff, gap_open: int,
                 gap_ext: int):
    """Batched full-width column recurrence (extender.py:325-384 vectorized).

    SpM: (N, WS) parent S masked to the M read span [first-1, min(last,
    wsize-1)]; SpF/Fp: parent S/F masked to the F read span (the child band
    [band_lo, band_hi]); prof: (N, WS) profile rows; node_score: (N,);
    has_del: (N,) whether offset > 1; band_lo/band_hi: (N,) inclusive child
    band bounds (begin, end-1) — E values outside the band are masked unless
    the cell survives the cutoff (the host's ins-end appended region).
    Returns (S, E, F) each (N, WS) int64, identical to the host's banded
    columns embedded at full width.
    """
    N, WS = SpM.shape
    dt = SpM.dtype
    ns = node_score[:, None]
    # M[j] = Sp[j-1] + prof[j] + ns  (M[0] = NINF)
    M = np.full((N, WS), NINF, dtype=dt)
    M[:, 1:] = np.where(SpM[:, :-1] == NINF, NINF,
                        SpM[:, :-1] + prof[:, 1:] + ns)
    # F[j] = max(Sp[j] + open, Fp[j] + ext) + ns   (only when offset > 1)
    del_open = np.where(SpF == NINF, NINF, SpF + gap_open)
    del_ext = np.where(Fp == NINF, NINF, Fp + gap_ext)
    F = np.maximum(del_open, del_ext)
    F = np.where(F == NINF, NINF, F + ns)
    F = np.where(has_del[:, None], F, NINF)
    M = np.maximum(M, F)
    # E[j] = max_{i<j} M[i] + open + (j-1-i)*ext  via running max
    E = np.full((N, WS), NINF, dtype=dt)
    if WS > 1:
        idx = np.arange(WS, dtype=dt)
        B = M + gap_open - (idx + 1)[None, :] * gap_ext
        run = np.maximum.accumulate(B, axis=1)
        # Ev = run + idx*ext; clamp Ev <= NINF to NINF — tested BEFORE the
        # addition (run <= NINF - idx*ext) so int32 storage cannot wrap
        idxge = (idx[1:] * gap_ext)[None, :]
        E[:, 1:] = np.where(run[:, :-1] <= NINF - idxge, NINF,
                            run[:, :-1] + idxge)
    cut = np.asarray(xdrop_cutoff, dtype=dt)
    if cut.ndim:
        cut = cut[:, None]
    S = np.maximum(M, E)
    S = np.where(S < cut, NINF, S)
    # E presence: in-band cells keep raw E (host stores them unmasked); the
    # appended region beyond the band exists only while the chain clears the
    # cutoff (extender.py:386-410)
    jj = np.arange(WS)
    in_band = (jj[None, :] >= band_lo[:, None]) \
        & (jj[None, :] <= band_hi[:, None])
    E = np.where(in_band | (S != NINF), E, NINF)
    return S, E, F


class WaveExtender(DefaultColumnExtender):
    """Drop-in DefaultColumnExtender computed via the flat wave engine."""

    flat_capable = True

    def get_extensions(self, seed: Alignment, min_path_score: int,
                       force_fixed_seed: bool) -> List[Alignment]:
        from .flat import extend_flat
        return extend_flat([(self, seed, min_path_score,
                             force_fixed_seed)])[0]


# re-export for existing callers (moved to flat.py)
from .flat import _outgoing_batch  # noqa: E402,F401
