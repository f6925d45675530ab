"""Device-compressed annotation matrices (BRWT descend, row-diff walk)
match the host representations exactly (ref multi_brwt/brwt.hpp:66-76,
row_diff/row_diff.hpp:37)."""

import numpy as np
import pytest

import jax.numpy as jnp

from metagraph_tpu.annotation.matrix import (BRWT, RowDiff, StaticAnnotation)
from metagraph_tpu.annotation.device_matrix import (
    DeviceBRWT, DeviceRowDiff, brwt_row_words, rowdiff_row_words,
    dense_row_words)


def pack_mask(mask):
    Q, L = mask.shape
    Lw = max((L + 31) // 32, 1)
    m = np.concatenate([mask, np.zeros((Q, Lw * 32 - L), bool)], axis=1)
    return np.packbits(m.reshape(Q, Lw, 32), axis=2,
                       bitorder="little").view(np.uint32)[:, :, 0]


@pytest.mark.parametrize("linkage", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_brwt_matches_host(seed, linkage):
    rng = np.random.default_rng(seed)
    R = int(rng.integers(50, 1500))
    L = int(rng.integers(1, 25))
    cols = [np.sort(rng.choice(R, size=rng.integers(0, R // 2 + 1),
                               replace=False)) for _ in range(L)]
    h = BRWT.from_columns(cols, R, L, linkage=linkage)
    d = DeviceBRWT.from_host(h)
    rows = rng.integers(-1, R, 300).astype(np.int32)
    got = np.asarray(brwt_row_words(d, jnp.asarray(rows)))
    exp = np.zeros((300, L), bool)
    valid = rows >= 0
    exp[valid] = h.get_rows_mask(rows[valid])
    assert np.array_equal(got, pack_mask(exp))


@pytest.mark.parametrize("inner_brwt", [False, True])
def test_device_rowdiff_matches_host(inner_brwt):
    rng = np.random.default_rng(4)
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    seqs = ["".join(rng.choice(list("ACGT"), 300)).encode() for _ in range(3)]
    g = DBGSuccinct.build(seqs, 9)
    R, L = g.max_index(), 5
    cols = [np.sort(rng.choice(R, size=R // 4, replace=False))
            for _ in range(L)]
    rd = RowDiff.from_annotation(cols, R, L, g,
                                 inner_type=BRWT if inner_brwt else
                                 type(rd_inner_default()))
    if inner_brwt:
        inner = DeviceBRWT.from_host(rd.inner)
        words_fn = lambda r, i=inner: brwt_row_words(i, r)  # noqa: E731
    else:
        from metagraph_tpu.query.pipeline import QueryEngine
        from metagraph_tpu.annotation.ops import DeviceAnnotation
        bm = QueryEngine._pack_matrix_bitmap(rd.inner)
        inner = DeviceAnnotation(jnp.asarray(bm), L)
        words_fn = lambda r, i=inner: dense_row_words(i, r)  # noqa: E731
    dev = DeviceRowDiff.from_host(rd, inner)
    rows = rng.integers(-1, R, 500).astype(np.int32)
    got = np.asarray(rowdiff_row_words(dev, jnp.asarray(rows), words_fn))
    exp = np.zeros((500, L), bool)
    valid = rows >= 0
    exp[valid] = rd.get_rows_mask(rows[valid])
    assert np.array_equal(got, pack_mask(exp))


def rd_inner_default():
    from metagraph_tpu.annotation.matrix import RowFlat
    return RowFlat(np.zeros(1, np.int64), np.zeros(0, np.int64), 1)


def test_query_engine_uses_compressed_device_path(monkeypatch):
    # force the descend/walk path: with the default budget this small
    # matrix would densify into a device working bitmap instead
    monkeypatch.setenv("METAGRAPH_DENSE_ANNO_BUDGET", "0")
    rng = np.random.default_rng(2)
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    from metagraph_tpu.annotation.column import ColumnMajorAnnotation
    from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
    from metagraph_tpu.query.pipeline import QueryEngine
    seqs = ["".join(rng.choice(list("ACGT"), 350)).encode() for _ in range(5)]
    g = DBGSuccinct.build(seqs, 11)
    anno = ColumnMajorAnnotation(g.max_index())
    ag = AnnotatedDBG(g, anno)
    for i, s in enumerate(seqs):
        ag.annotate_sequence(s, [f"s{i}"])
    anno.freeze()
    cols = [anno.column_rows(c) for c in range(anno.num_labels)]
    R, L = anno.num_rows, anno.num_labels
    reads = [s[:90] for s in seqs]
    for name, matrix in [
            ("brwt", BRWT.from_columns(cols, R, L)),
            ("row_diff_brwt",
             RowDiff.from_annotation(cols, R, L, g, inner_type=BRWT))]:
        ag2 = AnnotatedDBG(g, StaticAnnotation(matrix, anno.encoder, name))
        host = QueryEngine(ag2, use_device=False)
        dev = QueryEngine(ag2, use_device=True)
        for mode in ("labels", "matches"):
            ph = host.execute_batch(host.map_batch(reads), mode, 3, 0.7, 0.0)
            pd = dev.execute_batch(dev.map_batch(reads), mode, 3, 0.7, 0.0)
            assert str(ph) == str(pd), (name, mode)
        # beyond the dense budget the primary device representation is the
        # block-sparse annotation (r5); the dynamic descend remains the
        # fallback when the sparse conversion bails (forced below)
        from metagraph_tpu.annotation.sparse_device import \
            DeviceBlockSparseAnno
        assert isinstance(dev._device_anno, DeviceBlockSparseAnno)
        dev2 = QueryEngine(ag2, use_device=True)
        monkeypatch.setattr(DeviceBlockSparseAnno, "from_matrix",
                            classmethod(lambda *a, **k: None))
        pd2 = dev2.execute_batch(dev2.map_batch(reads), "labels", 3, 0.7,
                                 0.0)
        ph2 = host.execute_batch(host.map_batch(reads), "labels", 3, 0.7,
                                 0.0)
        assert str(ph2) == str(pd2), name
        assert dev2._device_words is not None
        monkeypatch.undo()
        monkeypatch.setenv("METAGRAPH_DENSE_ANNO_BUDGET", "0")


def test_large_label_space_stays_compressed():
    rng = np.random.default_rng(9)
    L, R = 4096, 3000
    cols = [np.sort(rng.choice(R, size=rng.integers(1, 20), replace=False))
            for _ in range(L)]
    h = BRWT.from_columns(cols, R, L, linkage=False)
    d = DeviceBRWT.from_host(h)
    total = sum(int(np.asarray(w).nbytes) for w in d.words)
    dense = R * ((L + 31) // 32) * 4
    assert total < dense / 4
    rows = rng.integers(0, R, 64).astype(np.int32)
    got = np.asarray(brwt_row_words(d, jnp.asarray(rows)))
    assert np.array_equal(got, pack_mask(h.get_rows_mask(rows)))
