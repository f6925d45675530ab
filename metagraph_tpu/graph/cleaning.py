"""Graph cleaning (ref src/graph/graph_cleaning.{hpp,cpp}, cli/clean.cpp).

The abundance-threshold estimator is the mccortex/McVean heuristic used by the
reference (gamma-poisson error model fitted to the k-mer coverage histogram);
formulas re-derived from the reference implementation (graph_cleaning.cpp:
213-330, itself MIT-licensed from mccortex).
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np


def is_unreliable_unitig(path_weights: np.ndarray,
                         min_median_abundance: int) -> bool:
    """median(weights) < threshold, counted via weak k-mers
    (ref graph_cleaning.cpp:14-32)."""
    if min_median_abundance <= 1:
        return False
    num_weak = int((np.asarray(path_weights) < min_median_abundance).sum())
    return num_weak * 2 > len(path_weights)


def kmer_coverage_histogram(weights: np.ndarray) -> np.ndarray:
    """histogram over k-mer counts 0..max (ref estimate_min_kmer_abundance)."""
    weights = np.asarray(weights)
    weights = weights[weights > 0]
    hist = np.bincount(weights.astype(np.int64))
    if len(hist) < 10:
        hist = np.concatenate([hist, np.zeros(10 - len(hist), dtype=hist.dtype)])
    return hist


def cleaning_pick_kmer_threshold(hist: np.ndarray, fdr_thres: float = 0.001
                                 ) -> int:
    """Pick the coverage cutoff; -1 if estimation fails
    (ref cleaning_pick_kmer_threshold, graph_cleaning.cpp:213-330)."""
    hist = np.asarray(hist, dtype=np.float64)
    arrlen = len(hist)
    if arrlen < 10 or hist[1] == 0 or hist[2] == 0:
        return -1

    r1 = hist[2] / hist[1]
    r2 = hist[3] / hist[2] if hist[2] else 0.0
    rr = r2 / r1 if r1 else 0.0

    best, best_i = math.inf, 0
    for i in range(1, 201):
        aa = i * 0.01
        faa = (math.gamma(aa) * math.gamma(aa + 2)
               / (2 * math.gamma(aa + 1) ** 2))
        d = abs(faa - rr)
        if d < best:
            best, best_i = d, i
    a_est = best_i * 0.01
    b_est = math.gamma(a_est + 1.0) / (r1 * math.gamma(a_est)) - 1.0
    b_est = max(b_est, 1.0)
    c0 = hist[1] * (b_est / (1 + b_est)) ** (-a_est)

    log_b = math.log(b_est)
    log_1b = math.log(1 + b_est)
    lg_a = math.lgamma(a_est)

    e_covg = np.zeros(arrlen)
    for i in range(1, arrlen):
        t = (a_est * log_b - lg_a - math.lgamma(i)
             + math.lgamma(a_est + i - 1) - (a_est + i - 1) * log_1b)
        e_covg[i] = math.exp(t) * c0
    e_total = e_covg[1:].sum()
    d_total = hist[1:].sum()

    cutoff = -1
    # A: first coverage where error fraction <= fdr
    for i in range(1, arrlen):
        if hist[i] and e_covg[i] / hist[i] <= fdr_thres:
            cutoff = i
            break
    # B: highest cutoff with FP < FN
    if cutoff < 0:
        e_rem, d_rem = e_total, d_total
        e_sum = d_sum = 0.0
        for i in range(1, arrlen):
            e_sum += e_covg[i]
            d_sum += hist[i]
            e_rem -= e_covg[i]
            d_rem -= hist[i]
            if d_sum and d_rem and 1 - e_sum / d_sum > e_rem / d_rem:
                cutoff = i
                break
    # C: loss vs error
    if cutoff < 0:
        e_rem = e_total
        e_sum = d_sum = 0.0
        for i in range(1, arrlen):
            e_sum += e_covg[i]
            d_sum += hist[i]
            e_rem -= e_covg[i]
            if d_sum - e_sum > e_rem:
                cutoff = i
                break
    if cutoff < 0:
        return -1

    # keep >= 20% of coverage
    idx = np.arange(arrlen, dtype=np.float64)
    below = float((hist[:cutoff] * idx[:cutoff]).sum())
    above = float((hist[cutoff:] * idx[cutoff:]).sum())
    if below + above and above / (below + above) < 0.2:
        return -1
    return cutoff


def estimate_min_kmer_abundance(weights: np.ndarray,
                                num_singleton_kmers: int = 0,
                                fdr: float = 0.001) -> int:
    hist = kmer_coverage_histogram(weights).astype(np.uint64)
    if num_singleton_kmers:
        hist[1] = num_singleton_kmers
    return cleaning_pick_kmer_threshold(hist, fdr)


def smooth_vector(window: int, values: np.ndarray) -> np.ndarray:
    """Sliding-window mean smoothing of contig count vectors
    (ref common/algorithms.hpp utils::smooth_vector)."""
    if window <= 1 or len(values) <= 1:
        return values
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    out = np.empty(n, dtype=values.dtype)
    half = window // 2
    cs = np.concatenate([[0], np.cumsum(v)])
    for i in range(n):
        lo = max(0, i - half)
        hi = min(n, i + (window - half))
        out[i] = int((cs[hi] - cs[lo]) / (hi - lo))
    return out


def clean_graph_contigs(graph, min_count: int = 1, max_count: int = 2 ** 63,
                        prune_tips: int = 1,
                        prune_unitigs: Optional[int] = 1,
                        fallback: int = 1,
                        unitigs: bool = False,
                        smoothing_window: int = 1,
                        num_singleton_kmers: int = 0):
    """Run the clean pipeline; returns (contig code arrays, count arrays).

    Mirrors cli/clean.cpp:28-190: optional count-range masking, automatic
    abundance threshold (prune_unitigs=0), unitig median filter, tip pruning.
    """
    from . import traversal

    boss = graph.boss
    weights = boss.weights
    mask = None
    min_unitig_median = prune_unitigs if prune_unitigs is not None else 1

    if (min_count > 1 or max_count < 2 ** 63 or min_unitig_median != 1):
        if weights is None:
            raise ValueError("graph has no k-mer counts; rebuild with counts")
        if min_unitig_median == 0:
            cutoff = estimate_min_kmer_abundance(
                weights[boss.valid > 0], num_singleton_kmers)
            if cutoff == -1:
                if fallback == -1:
                    raise ValueError("cannot estimate abundance threshold")
                cutoff = fallback
            min_unitig_median = cutoff
        if min_count > 1 or max_count < 2 ** 63:
            mask = (boss.valid > 0) & (weights >= min_count) \
                   & (weights <= max_count)
            mask = mask.astype(np.uint8)

    single = graph.mode == "canonical"
    if min_unitig_median != 1:
        contigs_paths, tix = traversal.call_paths(boss, True, single, True,
                                                  mask, return_index=True)
        contigs_paths = [
            (p, s) for p, s in contigs_paths
            if traversal._keep_unitig(boss, tix, p, s, prune_tips)
            and not is_unreliable_unitig(weights[p], min_unitig_median)]
    elif unitigs or prune_tips > 1 or smoothing_window > 1:
        contigs_paths, tix = traversal.call_paths(boss, True, single, True,
                                                  mask, return_index=True)
        contigs_paths = [
            (p, s) for p, s in contigs_paths
            if traversal._keep_unitig(boss, tix, p, s, prune_tips)]
    else:
        contigs_paths = traversal.call_paths(boss, False, single, True, mask)

    seqs = [np.array(s, dtype=np.uint8) for _, s in contigs_paths]
    counts = None
    if weights is not None:
        counts = []
        for p, _ in contigs_paths:
            c = weights[np.array(p, dtype=np.int64)]
            counts.append(smooth_vector(smoothing_window, c))
    return seqs, counts
