"""Block-sparse device annotation (annotation/sparse_device.py r5):
counts identical to brute force, dense-row overflow exact, budget bail."""

import numpy as np
import jax.numpy as jnp
import pytest

from metagraph_tpu.annotation.matrix import BRWT
from metagraph_tpu.annotation.sparse_device import (DeviceBlockSparseAnno,
                                                    sparse_count_epoch)


def _make(R, L, density=0.02, n_dense=10, seed=0):
    rng = np.random.default_rng(seed)
    bits = rng.random((R, L)) < density
    if n_dense:
        bits[rng.choice(R, n_dense, replace=False)] = \
            rng.random((n_dense, L)) < 0.6
    cols = [np.flatnonzero(bits[:, c]) for c in range(L)]
    return bits, BRWT.from_columns(cols, R, L)


class TestBlockSparseAnno:
    @pytest.mark.parametrize("L", [30, 200, 1000])
    def test_counts_match_brute_force(self, L):
        rng = np.random.default_rng(1)
        R = 2500
        bits, brwt = _make(R, L, seed=L)
        d = DeviceBlockSparseAnno.from_matrix(brwt, R, tau=4)
        assert d is not None
        S, T, N = 9, 64, 30
        rows1 = rng.integers(0, R + 1, (N, T)).astype(np.int32)
        tile_seq = rng.integers(0, S, N).astype(np.int32)
        counts, present = sparse_count_epoch(
            d, jnp.asarray(rows1), jnp.asarray(tile_seq), S, L)
        want = np.zeros((S, L), np.int64)
        wp = np.zeros(S, np.int64)
        for n in range(N):
            sq = tile_seq[n]
            for t in range(T):
                r = rows1[n, t]
                if r > 0:
                    want[sq] += bits[r - 1]
                    wp[sq] += 1
        np.testing.assert_array_equal(np.asarray(counts), want)
        np.testing.assert_array_equal(np.asarray(present), wp)

    def test_all_rows_dense_overflow(self):
        # every row overflows tau: everything goes through the side matmul
        R, L = 300, 96
        bits, brwt = _make(R, L, density=0.5, n_dense=0, seed=3)
        d = DeviceBlockSparseAnno.from_matrix(brwt, R, tau=1)
        assert d is not None and d.dense8.shape[0] > R // 2
        rng = np.random.default_rng(4)
        rows1 = rng.integers(0, R + 1, (8, 32)).astype(np.int32)
        tile_seq = rng.integers(0, 3, 8).astype(np.int32)
        counts, _ = sparse_count_epoch(
            d, jnp.asarray(rows1), jnp.asarray(tile_seq), 3, L)
        want = np.zeros((3, L), np.int64)
        for n in range(8):
            for t in range(32):
                r = rows1[n, t]
                if r > 0:
                    want[tile_seq[n]] += bits[r - 1]
        np.testing.assert_array_equal(np.asarray(counts), want)

    def test_budget_bail(self):
        R, L = 400, 64
        _, brwt = _make(R, L, density=0.5, n_dense=0, seed=5)
        assert DeviceBlockSparseAnno.from_matrix(
            brwt, R, tau=1, max_dense_bytes=100) is None
