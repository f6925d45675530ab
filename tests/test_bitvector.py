"""Compressed bit-vector hierarchy (succinct/bitvector.py): stat/sd/rrr
rank/select/access parity, adaptive selection, serialization, and the
compressed-column annotation codec."""

import numpy as np
import pytest

from metagraph_tpu.succinct.bitvector import (
    BitVectorRRR, BitVectorSD, BitVectorStat, bit_vector_smallest,
    bitvector_from_dict, predict_size_bits)

VARIANTS = (BitVectorStat, BitVectorSD, BitVectorRRR)


@pytest.mark.parametrize("density", [0.0005, 0.03, 0.25, 0.5, 0.97])
@pytest.mark.parametrize("cls", VARIANTS)
def test_rank_select_access_match_reference(cls, density):
    rng = np.random.default_rng(int(density * 10000))
    n = 40013
    bits = (rng.random(n) < density).astype(np.uint8)
    m = int(bits.sum())
    if m == 0:
        bits[n // 2] = 1
        m = 1
    pos = np.flatnonzero(bits)
    ref_rank = np.concatenate([[0], np.cumsum(bits)])
    v = cls(bits)
    assert v.n == n and v.num_set_bits == m
    qi = rng.integers(0, n + 1, 400)
    np.testing.assert_array_equal(v.rank1(qi), ref_rank[qi])
    qj = rng.integers(0, m, 400)
    np.testing.assert_array_equal(v.select1(qj), pos[qj])
    qg = rng.integers(0, n, 400)
    np.testing.assert_array_equal(v.get(qg), bits[qg].astype(bool))
    # serialization roundtrip (npz-compatible dict)
    v2 = bitvector_from_dict(v.to_dict())
    np.testing.assert_array_equal(v2.rank1(qi), ref_rank[qi])
    np.testing.assert_array_equal(v2.select1(qj), pos[qj])


def test_adaptive_chooser_tracks_density():
    """sparse -> sd, balanced -> stat, near-constant -> rrr (the
    smallest_representation policy of common/vectors/bit_vector.hpp)."""
    rng = np.random.default_rng(3)
    n = 60000
    sparse = (rng.random(n) < 0.002).astype(np.uint8)
    mid = (rng.random(n) < 0.4).astype(np.uint8)
    dense = np.ones(n, np.uint8)
    dense[rng.integers(0, n, 20)] = 0
    assert bit_vector_smallest(sparse).kind == "sd"
    assert bit_vector_smallest(mid).kind == "stat"
    assert bit_vector_smallest(dense).kind == "rrr"
    # chooser's pick is (near-)smallest in measured bytes too
    for bits in (sparse, mid, dense):
        sizes = {cls.kind: cls(bits).size_bytes() for cls in VARIANTS}
        assert sizes[bit_vector_smallest(bits).kind] == min(sizes.values())


def test_sd_beats_stat_on_sparse_and_rrr_near_entropy():
    rng = np.random.default_rng(4)
    n = 100000
    bits = (rng.random(n) < 0.001).astype(np.uint8)
    assert BitVectorSD(bits).size_bytes() < BitVectorStat(bits).size_bytes() / 20
    dense = (rng.random(n) < 0.98).astype(np.uint8)
    assert BitVectorRRR(dense).size_bytes() < BitVectorStat(dense).size_bytes()


def test_predict_size_orders_variants():
    n = 1 << 20
    assert predict_size_bits(n, n // 1000, "sd") \
        < predict_size_bits(n, n // 1000, "stat")
    assert predict_size_bits(n, n // 2, "stat") \
        < predict_size_bits(n, n // 2, "sd")


def test_column_annotation_smallest_codec_roundtrip(tmp_path):
    from metagraph_tpu.annotation.column import ColumnMajorAnnotation
    rng = np.random.default_rng(9)
    a = ColumnMajorAnnotation(5000)
    a.add_labels(np.unique(rng.integers(0, 5000, 40)), ["sparse"])
    a.add_labels(np.unique(rng.integers(0, 5000, 3000)), ["dense"])
    a.freeze()
    p = str(tmp_path / "anno.column.annodbg")
    a.save(p, codec="smallest")
    b = ColumnMajorAnnotation.load(p)
    assert b.column_codecs == ["sd", "stat"] \
        or b.column_codecs[0] == "sd"
    for c in range(a.num_labels):
        np.testing.assert_array_equal(a.column_rows(c), b.column_rows(c))
    rows = rng.integers(0, 5000, 200)
    np.testing.assert_array_equal(a.get_rows_mask(rows), b.get_rows_mask(rows))
