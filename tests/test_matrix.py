"""All annotation matrix representations must return identical query results
(ref tests/annotation/test_matrix*.cpp shared suites)."""

import numpy as np
import pytest

from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
from metagraph_tpu.annotation.column import ColumnMajorAnnotation
from metagraph_tpu.annotation.matrix import (BRWT, MATRIX_TYPES, RowDiff,
                                             RowFlat, convert_annotation)
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct

ALL_TYPES = list(MATRIX_TYPES) + ["row_diff", "row_diff_brwt",
                                  "row_diff_sparse"]


def random_annotation(num_rows=500, num_labels=17, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    anno = ColumnMajorAnnotation(num_rows)
    for c in range(num_labels):
        rows = np.flatnonzero(rng.random(num_rows) < density)
        anno.add_labels(rows, [f"label{c}"])
    anno.freeze()
    return anno


@pytest.fixture(scope="module")
def annotated_graph():
    rng = np.random.default_rng(3)
    seqs = ["".join(rng.choice(list("ACGT"), size=600)).encode()
            for _ in range(4)]
    g = DBGSuccinct.build(seqs, 11)
    anno = ColumnMajorAnnotation(g.max_index())
    ag = AnnotatedDBG(g, anno)
    for i, s in enumerate(seqs):
        ag.annotate_sequence(s, [f"seq{i}", "all"])
    anno.freeze()
    return g, anno, seqs


class TestMatrixParity:
    @pytest.mark.parametrize("name", list(MATRIX_TYPES))
    def test_random_matrix_matches_column(self, name):
        anno = random_annotation()
        m = convert_annotation(anno, name)
        rng = np.random.default_rng(1)
        rows = rng.integers(0, anno.num_rows, size=200)
        np.testing.assert_array_equal(m.get_rows_mask(rows),
                                      anno.get_rows_mask(rows))
        assert m.num_labels == anno.num_labels

    @pytest.mark.parametrize("name", ALL_TYPES)
    def test_graph_annotation_matches_column(self, annotated_graph, name):
        g, anno, seqs = annotated_graph
        m = convert_annotation(anno, name, graph=g)
        rng = np.random.default_rng(2)
        rows = rng.integers(0, anno.num_rows, size=100)
        np.testing.assert_array_equal(m.get_rows_mask(rows),
                                      anno.get_rows_mask(rows),
                                      err_msg=name)

    def test_sum_rows_equivalence(self, annotated_graph):
        g, anno, seqs = annotated_graph
        m = convert_annotation(anno, "row_diff_brwt", graph=g)
        nodes = g.map_to_nodes_sequentially(seqs[0])
        rows = nodes[nodes > 0] - 1
        pairs = [(int(r), 1) for r in rows]
        assert m.sum_rows(pairs, 1) == anno.sum_rows(pairs, 1)

    def test_row_diff_anchors_bound_paths(self, annotated_graph):
        g, anno, _ = annotated_graph
        succ, anchors = RowDiff.build_routing(g, max_length=10)
        # every walk terminates within ~max_length steps
        for r in np.flatnonzero(g.boss.valid) - 1:
            steps = 0
            cur = int(r)
            while not anchors[cur] and succ[cur] >= 0:
                cur = int(succ[cur])
                steps += 1
                assert steps <= 11


class TestNewMatrixTypes:
    def make_columns(self, seed=4, n_rows=500, n_labels=12):
        rng = np.random.default_rng(seed)
        return [np.flatnonzero(rng.random(n_rows) < 0.15).astype(np.int64)
                for _ in range(n_labels)], n_rows, n_labels

    def test_bin_rel_wt_get_column(self):
        from metagraph_tpu.annotation.matrix import BinRelWT
        cols, n, L = self.make_columns()
        m = BinRelWT.from_columns(cols, n, L)
        for c in range(L):
            np.testing.assert_array_equal(np.sort(m.get_column(c)), cols[c])

    def test_row_disk_roundtrip(self, tmp_path):
        import pickle
        from metagraph_tpu.annotation.matrix import RowDisk, RowFlat
        cols, n, L = self.make_columns()
        m = RowDisk.from_columns(cols, n, L, path_base=str(tmp_path / "rd"))
        ref = RowFlat.from_columns(cols, n, L)
        rows = np.arange(0, n, 7)
        np.testing.assert_array_equal(m.get_rows_mask(rows),
                                      ref.get_rows_mask(rows))
        m2 = pickle.loads(pickle.dumps(m))        # stays on disk
        np.testing.assert_array_equal(m2.get_rows_mask(rows),
                                      ref.get_rows_mask(rows))

    def test_brwt_linkage_groups_similar_columns(self):
        from metagraph_tpu.annotation.matrix import BRWT
        rng = np.random.default_rng(1)
        base1 = np.flatnonzero(rng.random(400) < 0.3)
        base2 = np.flatnonzero(rng.random(400) < 0.3)
        # two correlated pairs + one independent column
        cols = [base1, base1[:-5], base2, base2[5:],
                np.flatnonzero(rng.random(400) < 0.3)]
        tree = BRWT.greedy_linkage(cols, 400)

        def pairs(t, acc):
            if isinstance(t, tuple):
                if isinstance(t[0], int) and isinstance(t[1], int):
                    acc.append(tuple(sorted((t[0], t[1]))))
                else:
                    pairs(t[0], acc)
                    pairs(t[1], acc)
            return acc
        leaf_pairs = pairs(tree, [])
        assert (0, 1) in leaf_pairs and (2, 3) in leaf_pairs

    def test_brwt_linkage_sketch_partition_path(self):
        """Label counts beyond LINKAGE_GROUP take the sketch-partitioned
        route (VERDICT r3 next #7: no dense L x L similarity matrix).
        The tree must cover every label once, correlated columns must
        still pair, and queries through the built tree stay exact."""
        from metagraph_tpu.annotation.matrix import BRWT, RowFlat
        rng = np.random.default_rng(4)
        R = 600
        old_group = BRWT.LINKAGE_GROUP
        BRWT.LINKAGE_GROUP = 64          # force grouping at a testable size
        try:
            base = [np.flatnonzero(rng.random(R) < 0.05) for _ in range(16)]
            cols = []
            L = 300                      # > 4 groups of 64
            for c in range(L):
                b = base[c % 16]
                cols.append(np.unique(np.concatenate(
                    [b[rng.random(len(b)) < 0.9],
                     rng.integers(0, R, 2)])))
            tree = BRWT.greedy_linkage(cols, R)

            def leaves(t):
                return [t] if isinstance(t, int) \
                    else leaves(t[0]) + leaves(t[1])
            assert sorted(leaves(tree)) == list(range(L))
            m = BRWT.from_columns(cols, R, L)
            ref = RowFlat.from_columns(cols, R, L)
            rows = np.arange(0, R, 5)
            np.testing.assert_array_equal(m.get_rows_mask(rows),
                                          ref.get_rows_mask(rows))
        finally:
            BRWT.LINKAGE_GROUP = old_group


class TestIntCoordMatrices:
    """Integer/coordinate matrices (ref int_row_diff.hpp:45,
    tuple_row_diff.hpp:27, csr_matrix.hpp:18): conversion round-trips must
    reproduce the column annotation's values/coords exactly."""

    @pytest.fixture(scope="class")
    def setup(self):
        from metagraph_tpu.annotation.column import ColumnMajorAnnotation
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        rng = np.random.default_rng(12)
        seqs = ["".join(rng.choice(list("ACGT"), size=200)).encode()
                for _ in range(3)]
        g = DBGSuccinct.build(seqs, 11)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for i, s in enumerate(seqs):
            ag.annotate_kmer_coords(s, [f"s{i}"], 0)
            ag.annotate_kmer_counts(s, [f"s{i}"])
        return g, anno

    def test_int_matrices_match_column(self, setup):
        from metagraph_tpu.annotation.matrix import convert_annotation
        g, anno = setup
        rows = np.arange(0, anno.num_rows, 3)
        ref = anno.get_row_values(rows)
        for target in ("int_brwt", "row_diff_int_brwt"):
            m = convert_annotation(anno, target, graph=g)
            assert m.get_row_values(rows) == ref
            np.testing.assert_array_equal(m.get_rows_mask(rows),
                                          anno.get_rows_mask(rows))

    def test_coord_matrices_match_column(self, setup):
        from metagraph_tpu.annotation.matrix import convert_annotation
        g, anno = setup
        rows = np.arange(0, anno.num_rows, 3)
        ref = anno.get_row_tuples(rows)
        for target in ("brwt_coord", "row_diff_coord", "row_diff_brwt_coord"):
            m = convert_annotation(anno, target, graph=g)
            assert m.get_row_tuples(rows) == ref

    def test_static_annotation_delegates(self, setup, tmp_path):
        from metagraph_tpu.annotation.matrix import (StaticAnnotation,
                                                     convert_annotation,
                                                     load_annotation)
        g, anno = setup
        m = convert_annotation(anno, "row_diff_coord", graph=g)
        st = StaticAnnotation(m, anno.encoder, "row_diff_coord")
        p = str(tmp_path / "x.row_diff_coord.annodbg")
        st.save(p)
        st2 = load_annotation(p)
        assert st2.has_coords
        rows = np.arange(0, anno.num_rows, 5)
        assert st2.get_row_tuples(rows) == anno.get_row_tuples(rows)


class TestRowSparseEncoding:
    """RowSparse must be a real delta-coded representation, not a RowFlat
    alias (ref row_sparse/row_sparse.hpp:16 vlc_vector + boundary)."""

    def test_compresses_and_roundtrips(self, tmp_path):
        import pickle
        from metagraph_tpu.annotation.matrix import RowFlat, RowSparse
        rng = np.random.default_rng(7)
        R, L = 4000, 300
        cols = [np.sort(rng.choice(R, size=rng.integers(0, 60),
                                   replace=False)).astype(np.int64)
                for _ in range(L)]
        rs = RowSparse.from_columns(cols, R, L)
        rf = RowFlat.from_columns(cols, R, L)
        q = rng.integers(0, R, size=500)
        np.testing.assert_array_equal(rs.get_rows_mask(q), rf.get_rows_mask(q))
        assert rs.num_relations() == len(rf.indices)
        sparse_bytes = rs.words.nbytes + rs.widths.nbytes \
            + rs.boundary.words.nbytes
        flat_bytes = rf.indices.nbytes + rf.indptr.nbytes
        assert sparse_bytes * 3 < flat_bytes          # real compression
        rs2 = pickle.loads(pickle.dumps(rs))
        np.testing.assert_array_equal(rs2.get_rows_mask(q),
                                      rf.get_rows_mask(q))


class TestRowDiffCycleBasins:
    """Vectorized cycle-basin anchor assignment (VERDICT r3 next #8) must
    reproduce the sequential ascending-order walk exactly."""

    @staticmethod
    def _sequential(succ_full, valid, max_length):
        M = len(succ_full)
        idx = np.flatnonzero(valid)
        anchors = np.zeros(M, dtype=bool)
        dist = np.full(M, -1, dtype=np.int64)
        jump = np.where(succ_full > 0, succ_full, np.arange(M))
        w = (succ_full > 0).astype(np.int64)
        for _ in range(max(M - 1, 1).bit_length()):
            w = w + w[jump]
            jump = jump[jump]
        resolved = valid & (succ_full[jump] <= 0)
        if resolved.any():
            r = np.flatnonzero(resolved)
            dist[r] = w[r] % max_length
            anchors[r] = dist[r] == 0
        for e in idx:
            if dist[e] >= 0:
                continue
            path = []
            cur = e
            while cur > 0 and dist[cur] == -1:
                dist[cur] = -2
                path.append(cur)
                cur = succ_full[cur]
            if cur <= 0 or dist[cur] == -2:
                anchors[path[-1]] = True
                dist[path[-1]] = 0
                start = len(path) - 2
            else:
                start = len(path) - 1
            for i in range(start, -1, -1):
                nxt = succ_full[path[i]]
                d = dist[nxt] + 1 if nxt > 0 and dist[nxt] >= 0 else 0
                if nxt <= 0 or d >= max_length:
                    anchors[path[i]] = True
                    dist[path[i]] = 0
                else:
                    dist[path[i]] = d
        return anchors, dist

    def test_matches_sequential_walk(self):
        from metagraph_tpu.annotation.matrix import RowDiff
        rng = np.random.default_rng(7)
        for _ in range(12):
            M = int(rng.integers(20, 300))
            succ = np.full(M, -1, np.int64)
            valid = np.zeros(M, bool)
            valid[1:] = rng.random(M - 1) < 0.9
            ids = np.flatnonzero(valid)
            for n in ids:
                if rng.random() < 0.85:
                    succ[n] = ids[rng.integers(0, len(ids))]
            ml = int(rng.integers(2, 12))
            a1, d1 = self._sequential(succ, valid, ml)
            anchors = np.zeros(M, bool)
            dist = np.full(M, -1, np.int64)
            jump = np.where(succ > 0, succ, np.arange(M))
            w = (succ > 0).astype(np.int64)
            for _ in range(max(M - 1, 1).bit_length()):
                w = w + w[jump]
                jump = jump[jump]
            resolved = valid & (succ[jump] <= 0)
            if resolved.any():
                r = np.flatnonzero(resolved)
                dist[r] = w[r] % ml
                anchors[r] = dist[r] == 0
            unresolved = np.flatnonzero(valid & (dist == -1))
            if len(unresolved):
                RowDiff._resolve_cycle_basins(succ, unresolved, dist,
                                              anchors, ml)
            assert np.array_equal(a1, anchors)
            assert np.array_equal(d1, dist)
