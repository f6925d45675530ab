"""Multi-device sharding of the k-mer index and query batches.

The reference scales out by partitioning the sorted k-mer space by suffix and
exchanging chunk files (ref build.cpp:110-158, SURVEY.md §2.10).  On TPU the
same partition is a *contiguous range partition of the sorted k-mer keys*
sharded over a mesh axis ('model'); query batches shard over 'data'.  Each
model shard runs the same fixed-depth binary search over its resident range;
per-shard hits (disjoint, 0 = miss) combine with a max-reduce over the model
axis — the collective equivalent of the reference's chunk concatenation.

Annotation columns shard over 'model' as well (labels are the wide axis at
scale: millions of columns), with per-label counts combined by all-gather.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..succinct.ops import _kmer_lookup


def make_mesh(n_devices: int | None = None, model_axis: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if model_axis is None:
        model_axis = 2 if n % 2 == 0 and n >= 2 else 1
    data_axis = n // model_axis
    arr = np.array(devs[: data_axis * model_axis]).reshape(data_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def pad_rows(a: np.ndarray, multiple: int, fill=0) -> np.ndarray:
    n = a.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return a
    pad = np.full((target - n,) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


def shard_kmer_index(keys: np.ndarray, ids: np.ndarray, mesh: Mesh):
    """Range-partition sorted (keys, ids) across the 'model' axis.

    Padding keys are all-ones (0xFFFF...) so they sort last and never match a
    real query; padding ids are 0 (= miss).
    """
    m = mesh.shape["model"]
    keys = pad_rows(keys, m, fill=np.iinfo(keys.dtype).max)
    ids = pad_rows(ids.astype(np.int32), m, fill=0)
    keys_d = jax.device_put(keys, jax.NamedSharding(mesh, P("model", None)))
    ids_d = jax.device_put(ids, jax.NamedSharding(mesh, P("model")))
    return keys_d, ids_d


def shard_hash_table(table: np.ndarray, mesh: Mesh):
    """Shard the bucketized hash table by bucket range over 'model'.

    Returns (sharded table, rows_per_shard, n_buckets).  ``n_buckets`` is the
    TRUE bucket count of the index — queries must hash modulo this, not the
    padded rows_per_shard * m, or every lookup lands in the wrong bucket
    whenever the model axis doesn't divide the bucket count."""
    m = mesh.shape["model"]
    n_buckets = table.shape[0]
    table = pad_rows(table, m, fill=np.iinfo(np.uint32).max)
    return (jax.device_put(table, jax.NamedSharding(mesh, P("model", None))),
            table.shape[0] // m, n_buckets)


def shard_annotation(bitmap: np.ndarray, mesh: Mesh):
    """Shard the annotation bitmap by label words over 'model'."""
    m = mesh.shape["model"]
    Lw = bitmap.shape[1]
    target = -(-Lw // m) * m
    if target != Lw:
        bitmap = np.concatenate(
            [bitmap, np.zeros((bitmap.shape[0], target - Lw), bitmap.dtype)],
            axis=1)
    return (jax.device_put(bitmap, jax.NamedSharding(mesh, P(None, "model"))),
            (bitmap.shape[1] // m) * 32)


def sharded_annotated_query_fn(mesh: Mesh, rows_per_shard: int,
                               labels_per_shard: int, num_seqs: int,
                               n_buckets: int | None = None):
    """The full multi-chip query step:

      * hash-index buckets range-sharded over 'model' (suffix-shard analog);
        each query's bucket lives on exactly one shard; pmax combines
      * annotation labels sharded over 'model'; per-sequence label counts
        computed locally -> output sharded (data, model)
      * query batch sharded over 'data'

    Contract: ``num_seqs`` must divide evenly over the 'data' axis (pad the
    sequence batch), and ``seq_ids`` are SHARD-LOCAL (0..num_seqs/data-1 on
    every shard) — windows with out-of-range ids would be dropped silently
    by segment_sum otherwise.
    """
    if num_seqs % mesh.shape["data"]:
        raise ValueError(
            f"num_seqs={num_seqs} must be a multiple of the data axis "
            f"({mesh.shape['data']}); pad the sequence batch")
    from ..annotation.ops import count_labels
    from ..succinct.ops import BUCKET, _hash_words

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("model", None), P(None, "model"), P("data", None),
                  P("data")),
        out_specs=(P("data", "model"), P("data")), check_vma=False)
    def _step(table_shard, bitmap_shard, queries, seq_ids):
        # hash modulo the index's TRUE bucket count (shard_hash_table pads
        # rows to the mesh, which must not change the modulus)
        n_buckets_global = n_buckets if n_buckets is not None \
            else rows_per_shard * mesh.shape["model"]
        my = jax.lax.axis_index("model") * rows_per_shard
        # single-probe layout (see DeviceHashIndex): one bucket row per query
        b = _hash_words(queries, n_buckets_global, 1)
        W = queries.shape[1]
        local = b - my
        in_range = (local >= 0) & (local < rows_per_shard)
        rows = table_shard[jnp.clip(local, 0, rows_per_shard - 1)]
        rows = rows.reshape(queries.shape[0], -1, W + 1)
        eq = jnp.all(rows[:, :, :W] == queries[:, None, :], axis=-1)
        hit = jnp.any(eq, axis=-1) & in_range
        ids = jnp.max(jnp.where(eq, rows[:, :, W], 0), axis=-1)
        out = jnp.where(hit, ids.astype(jnp.int32), 0)
        nodes = jax.lax.pmax(out, "model")
        counts, present = count_labels(bitmap_shard, nodes, seq_ids,
                                       num_seqs // mesh.shape["data"],
                                       labels_per_shard)
        return counts, present

    return jax.jit(_step)


def make_host_mesh(n_devices: int | None = None, host_axis: int = 2,
                   data_axis: int = 2) -> Mesh:
    """Mesh with an explicit 'host' axis: the multi-host (DCN) topology.

    The k-mer index range-partitions over ('host', 'model') — the cross-host
    split of the key space (the reference scales out by files+cloud the same
    way, scripts/cloud/client.py) — while 'data'/'model' traffic rides ICI
    within a host.  The query step below crosses the host axis with exactly
    ONE collective per epoch (the node-hit pmax), which is the DCN-friendly
    layout: per-host work is local until the final combine."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    model_axis = n // (host_axis * data_axis)
    if model_axis < 1:
        raise ValueError(f"need >= {host_axis * data_axis} devices, have {n}")
    arr = np.array(devs[: host_axis * data_axis * model_axis]).reshape(
        host_axis, data_axis, model_axis)
    return Mesh(arr, ("host", "data", "model"))


def shard_hash_table_host(table: np.ndarray, mesh: Mesh):
    """Shard the hash table by bucket range over ('host', 'model')."""
    m = mesh.shape["host"] * mesh.shape["model"]
    n_buckets = table.shape[0]
    table = pad_rows(table, m, fill=np.iinfo(np.uint32).max)
    return (jax.device_put(
        table, jax.NamedSharding(mesh, P(("host", "model"), None))),
        table.shape[0] // m, n_buckets)


def sharded_annotated_query_fn_host(mesh: Mesh, rows_per_shard: int,
                                    labels_per_shard: int, num_seqs: int,
                                    n_buckets: int):
    """The multi-HOST query step: index buckets sharded over
    ('host', 'model'), labels over 'model', queries over 'data'.  One pmax
    over ('host', 'model') is the only cross-host collective per epoch."""
    if num_seqs % mesh.shape["data"]:
        raise ValueError("num_seqs must be a multiple of the data axis")
    from ..annotation.ops import count_labels
    from ..succinct.ops import _hash_words

    n_model = mesh.shape["model"]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(("host", "model"), None), P(None, "model"),
                  P("data", None), P("data")),
        out_specs=(P("data", "model"), P("data")), check_vma=False)
    def _step(table_shard, bitmap_shard, queries, seq_ids):
        shard_i = (jax.lax.axis_index("host") * n_model
                   + jax.lax.axis_index("model"))
        my = shard_i * rows_per_shard
        b = _hash_words(queries, n_buckets, 1)
        W = queries.shape[1]
        local = b - my
        in_range = (local >= 0) & (local < rows_per_shard)
        rows = table_shard[jnp.clip(local, 0, rows_per_shard - 1)]
        rows = rows.reshape(queries.shape[0], -1, W + 1)
        eq = jnp.all(rows[:, :, :W] == queries[:, None, :], axis=-1)
        hit = jnp.any(eq, axis=-1) & in_range
        ids = jnp.max(jnp.where(eq, rows[:, :, W], 0), axis=-1)
        out = jnp.where(hit, ids.astype(jnp.int32), 0)
        # the one cross-host collective: combine disjoint per-range hits
        nodes = jax.lax.pmax(out, ("host", "model"))
        counts, present = count_labels(bitmap_shard, nodes, seq_ids,
                                       num_seqs // mesh.shape["data"],
                                       labels_per_shard)
        return counts, present

    return jax.jit(_step)


def collective_counts(compiled_text: str) -> dict:
    """Per-kind collective-op counts from compiled HLO text (the dryrun
    prints these to pin the communication plan; the host-mesh step must
    show exactly one all-reduce)."""
    import re
    out = {}
    for kind in ("all-reduce", "all-gather", "all-to-all",
                 "collective-permute", "reduce-scatter"):
        n = len(re.findall(rf"\b{kind}(?:-start)?\(", compiled_text)) \
            + len(re.findall(rf"= {kind}\b", compiled_text))
        out[kind] = n
    return out


def sharded_lookup_fn(mesh: Mesh):
    """Build the jitted sharded lookup: queries (Q, W) -> ids (Q,)."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("model", None), P("model"), P("data", None)),
        out_specs=P("data"), check_vma=False)  # noqa: B905 — fori carry is shard-local
    def _lookup(keys, ids, queries):
        local = _kmer_lookup(keys, ids, queries)
        return jax.lax.pmax(local, "model")

    return jax.jit(_lookup)


# ----------------------------------------------------- compressed annotations
# The reference's production indexes are Multi-BRWT / row-diff at millions of
# labels (ref multi_brwt/brwt.hpp:66-76) — exactly the case where one
# device's HBM cannot hold the matrix.  Labels shard by CONTIGUOUS RANGE over
# 'model': each shard holds a Multi-BRWT built over its label slice,
# flattened to arrays PADDED TO UNIFORM SHAPES so one SPMD program serves
# every shard (the tree descent below is fully dynamic — node counts, word
# offsets, parent maps, and leaf positions are device arrays, not Python
# structure).  Row-diff shards the same way: succ/anchor arrays are
# row-space (replicated); the per-shard inner BRWT serves the label slice.


class ShardedBRWT:
    """Per-shard Multi-BRWT forest as uniform stacked arrays.

    Fields (m = model shards, D = max depth over shards):
      words[l]  (m, Wmax_l) uint32 — level-l node bitmaps, concatenated
      rdir[l]   (m, Wmax_l) int32  — exclusive popcount per word within node
      offs[l]   (m, Nmax_l) int32  — word offset of each node (-1 = pad node)
      parent[l] (m, Nmax_l) int32  — parent node at level l-1 (-1 = pad)
      leaf_level / leaf_node (m, Ls) int32 — per LOCAL label (-1 = pad label)
    """

    def __init__(self, words, rdir, offs, parent, leaf_level, leaf_node,
                 labels_per_shard, num_labels):
        self.words = words
        self.rdir = rdir
        self.offs = offs
        self.parent = parent
        self.leaf_level = leaf_level
        self.leaf_node = leaf_node
        self.labels_per_shard = labels_per_shard
        self.num_labels = num_labels

    @property
    def depth(self):
        return len(self.words)

    def device_arrays(self, mesh: Mesh):
        """device_put every stacked array with the 'model' leading axis."""
        sh2 = jax.NamedSharding(mesh, P("model", None))
        put = lambda a: jax.device_put(a, sh2)
        return (tuple(put(w) for w in self.words),
                tuple(put(r) for r in self.rdir),
                tuple(put(o) for o in self.offs),
                tuple(put(p) for p in self.parent),
                put(self.leaf_level), put(self.leaf_node))


def shard_brwt_annotation(columns, num_rows: int, num_labels: int,
                          mesh: Mesh) -> ShardedBRWT:
    """Build one Multi-BRWT per label range (ceil(L/m) labels each) and
    flatten the forest into ShardedBRWT stacked arrays."""
    from ..annotation.matrix import BRWT
    from ..annotation.device_matrix import flatten_brwt
    m = mesh.shape["model"]
    Ls = -(-num_labels // m)
    per_level = []                 # [level][shard] -> (words, rdir, offs, par)
    leaves = []
    for i in range(m):
        lo, hi = i * Ls, min((i + 1) * Ls, num_labels)
        cols = [np.asarray(columns[c], dtype=np.int64) for c in range(lo, hi)]
        ll = np.full(Ls, -1, np.int32)
        ln = np.full(Ls, -1, np.int32)
        if hi > lo:
            brwt = BRWT.from_columns(cols, num_rows, hi - lo)
            flat, fll, fln = flatten_brwt(brwt)
            ll[: hi - lo] = fll[: hi - lo]
            ln[: hi - lo] = fln[: hi - lo]
        else:
            flat = []
        per_level.append(flat)
        leaves.append((ll, ln))

    D = max((len(f) for f in per_level), default=0)
    words_l, rdir_l, offs_l, par_l = [], [], [], []
    for li in range(D):
        Wmax = max((len(f[li][0]) if li < len(f) else 1)
                   for f in per_level)
        Nmax = max((len(f[li][2]) if li < len(f) else 1)
                   for f in per_level)
        w = np.zeros((m, Wmax), np.uint32)
        r = np.zeros((m, Wmax), np.int32)
        o = np.full((m, Nmax), -1, np.int32)
        p = np.full((m, Nmax), -1, np.int32)
        for i, f in enumerate(per_level):
            if li < len(f):
                fw, fr, fo, fp = f[li]
                w[i, : len(fw)] = fw
                r[i, : len(fr)] = fr
                o[i, : len(fo)] = fo
                p[i, : len(fp)] = fp
        words_l.append(w)
        rdir_l.append(r)
        offs_l.append(o)
        par_l.append(p)
    leaf_level = np.stack([x[0] for x in leaves])
    leaf_node = np.stack([x[1] for x in leaves])
    return ShardedBRWT(words_l, rdir_l, offs_l, par_l, leaf_level,
                       leaf_node, Ls, num_labels)


def _sharded_brwt_words(words_l, rdir_l, offs_l, par_l, leaf_level,
                        leaf_node, rows, Ls: int):
    """Dynamic Multi-BRWT descent for ONE shard's label slice:
    (Q,) row ids (-1 = miss) -> (Q, ceil(Ls/32)) packed label words.
    All tree structure (offsets, parents, leaf positions) is device data;
    pad nodes/labels carry -1 and stay dead."""
    Q = rows.shape[0]
    D = len(words_l)
    Lw = max(-(-Ls // 32), 1)
    state = jnp.where(rows[:, None] >= 0, rows[:, None], -1)     # (Q, 1)
    n_allmax = max(o.shape[0] for o in offs_l)
    bits_levels = []
    for l in range(D):
        offs = offs_l[l]
        alive = (state >= 0) & (offs[None, :] >= 0)
        r = jnp.maximum(state, 0)
        widx = jnp.maximum(offs[None, :], 0) + (r >> 5)
        w = words_l[l][widx]
        bitpos = (r & 31).astype(jnp.uint32)
        bit = ((w >> bitpos) & 1).astype(bool) & alive
        below = w & ((jnp.uint32(1) << bitpos) - jnp.uint32(1))
        rank_excl = rdir_l[l][widx] \
            + jax.lax.population_count(below).astype(jnp.int32)
        padb = jnp.zeros((Q, n_allmax - bit.shape[1]), bool)
        bits_levels.append(jnp.concatenate([bit, padb], axis=1))
        if l + 1 < D:
            nxt = jnp.where(bit, rank_excl, -1)                  # (Q, n_l)
            par = par_l[l + 1]
            taken = jnp.take(nxt, jnp.maximum(par, 0), axis=1)
            state = jnp.where(par[None, :] >= 0, taken, -1)
    if D == 0:
        return jnp.zeros((Q, Lw), jnp.uint32)
    bits_all = jnp.stack(bits_levels)                 # (D, Q, n_allmax)
    lv = jnp.maximum(leaf_level, 0)
    nd = jnp.maximum(leaf_node, 0)
    lbits = bits_all[lv, :, nd]                       # (Ls, Q)
    lbits = lbits & (leaf_level >= 0)[:, None]
    lbits = lbits.T                                   # (Q, Ls)
    pad = Lw * 32 - Ls
    if pad:
        lbits = jnp.concatenate([lbits, jnp.zeros((Q, pad), bool)], axis=1)
    powers = jnp.asarray((np.uint64(1) << np.arange(32, dtype=np.uint64))
                         .astype(np.uint32))
    return jnp.sum(lbits.reshape(Q, Lw, 32) * powers[None, None, :],
                   axis=2, dtype=jnp.uint32)


def _counts_from_words(words, hit, seq_ids, num_seqs: int, Ls: int):
    """(Q, Lw) packed words + hit mask -> per-sequence counts/present
    (the count_labels tail, words already gathered)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    Lw = words.shape[1]
    bits = ((words[:, :, None] >> shifts) & 1).astype(jnp.int32)
    bits = bits.reshape(words.shape[0], Lw * 32)[:, :Ls]
    counts = jax.ops.segment_sum(bits, seq_ids, num_segments=num_seqs)
    present = jax.ops.segment_sum(hit.astype(jnp.int32), seq_ids,
                                  num_segments=num_seqs)
    return counts, present


def sharded_annotated_query_compressed_fn(
        mesh: Mesh, rows_per_shard: int, labels_per_shard: int,
        num_seqs: int, n_buckets: int, depth: int,
        row_diff: bool = False, rd_max_depth: int = 0):
    """sharded_annotated_query_fn for COMPRESSED annotations: the hash
    index shards by bucket range over 'model' as before; the annotation is
    a ShardedBRWT label-range forest (optionally behind a row-diff
    successor walk whose succ/anchor arrays are replicated row-space data).
    Per-sequence counts come back sharded (data, model) in global label
    order (shard i's slice = labels [i*Ls, (i+1)*Ls))."""
    if num_seqs % mesh.shape["data"]:
        raise ValueError("num_seqs must be a multiple of the data axis")
    from ..succinct.ops import _hash_words
    Ls = labels_per_shard
    d = mesh.shape["data"]

    anno_specs = (tuple(P("model", None) for _ in range(depth)),) * 4 \
        + (P("model", None), P("model", None))
    rd_specs = (P(None), P(None)) if row_diff else ()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("model", None),) + anno_specs + rd_specs
        + (P("data", None), P("data")),
        out_specs=(P("data", "model"), P("data")), check_vma=False)
    def _step(table_shard, words_l, rdir_l, offs_l, par_l, leaf_level,
              leaf_node, *rest):
        if row_diff:
            succ, anchors, queries, seq_ids = rest
        else:
            queries, seq_ids = rest
        my = jax.lax.axis_index("model") * rows_per_shard
        b = _hash_words(queries, n_buckets, 1)
        W = queries.shape[1]
        local = b - my
        in_range = (local >= 0) & (local < rows_per_shard)
        rows = table_shard[jnp.clip(local, 0, rows_per_shard - 1)]
        rows = rows.reshape(queries.shape[0], -1, W + 1)
        eq = jnp.all(rows[:, :, :W] == queries[:, None, :], axis=-1)
        hit0 = jnp.any(eq, axis=-1) & in_range
        ids = jnp.max(jnp.where(eq, rows[:, :, W], 0), axis=-1)
        out = jnp.where(hit0, ids.astype(jnp.int32), 0)
        nodes = jax.lax.pmax(out, "model")
        hit = nodes > 0
        arows = jnp.where(hit, nodes - 1, -1)

        wl = tuple(w[0] for w in words_l)       # drop the size-1 shard axis
        rl = tuple(r[0] for r in rdir_l)
        ol = tuple(o[0] for o in offs_l)
        pl = tuple(p[0] for p in par_l)
        ll = leaf_level[0]
        ln = leaf_node[0]

        def brwt_words(r):
            return _sharded_brwt_words(wl, rl, ol, pl, ll, ln, r, Ls)

        if row_diff:
            Lw = max(-(-Ls // 32), 1)

            def body(_, carry):
                acc, cur, active = carry
                safe = jnp.maximum(cur, 0)
                w = brwt_words(jnp.where(active, safe, -1))
                acc = acc ^ jnp.where(active[:, None], w, 0)
                stop = anchors[safe] | (succ[safe] < 0)
                nxt = succ[safe]
                active = active & ~stop & (nxt >= 0)
                return acc, jnp.where(active, nxt, -1), active

            acc = jnp.zeros((arows.shape[0], Lw), jnp.uint32)
            active = arows >= 0
            words, _, _ = jax.lax.fori_loop(
                0, rd_max_depth, body,
                (acc, jnp.where(active, arows, -1), active))
        else:
            words = brwt_words(arows)
        return _counts_from_words(words, hit, seq_ids, num_seqs // d, Ls)

    return jax.jit(_step)
