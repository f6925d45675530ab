"""Compressed annotation matrices on device.

The dense (R, L/32) bitmap (annotation/ops.py) is impossible at the
reference's millions-of-labels scale.  These are the device-resident
compressed equivalents:

  * DeviceBRWT — the Multi-BRWT tree (ref multi_brwt/brwt.hpp:66-76)
    flattened level by level: all node bitmaps at one level live in one
    packed uint32 word array with per-node offsets + an exclusive popcount
    rank directory; a query descends all levels with fixed-depth batched
    gathers + lax.population_count ranks (no per-node recursion).
  * DeviceRowDiff — the row-diff transform (ref row_diff/row_diff.hpp:37):
    a bounded successor-walk fori_loop XOR-accumulates diff rows until every
    lane hits its anchor (the anchor assignment bounds the walk length).

Both produce packed (Q, ceil(L/32)) row words — the same interface the dense
DeviceAnnotation gather feeds into the tiled count kernels.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceBRWT:
    # per level: words, rank_dir (exclusive popcount up to each word within
    # its node), node word-offsets, node lengths (bits), parent index
    words: List[jnp.ndarray]
    rank_dir: List[jnp.ndarray]
    offs: List[jnp.ndarray]      # (n_l,) word offset per node
    parent: List[np.ndarray]     # static: (n_l,) parent node at level l-1
    leaf_level: np.ndarray       # static: (L,) level of each label's leaf
    leaf_node: np.ndarray        # static: (L,) node index of the leaf
    num_rows: int
    num_labels: int

    # parent/leaf maps steer Python-level loop structure inside jitted
    # kernels, so they are static aux data (hashable), not traced leaves
    def tree_flatten(self):
        children = (self.words, self.rank_dir, self.offs)
        aux = (tuple(tuple(int(x) for x in p) for p in self.parent),
               tuple(int(x) for x in self.leaf_level),
               tuple(int(x) for x in self.leaf_node),
               self.num_rows, self.num_labels)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        parent = [np.array(p, dtype=np.int32) for p in aux[0]]
        return cls(children[0], children[1], children[2], parent,
                   np.array(aux[1], dtype=np.int32),
                   np.array(aux[2], dtype=np.int32), aux[3], aux[4])

    @classmethod
    def from_host(cls, brwt) -> "DeviceBRWT":
        """Flatten a host BRWT (annotation/matrix.py:261) level by level."""
        levels = [[(brwt.root, -1)]]
        while True:
            nxt = []
            for pi, (node, _) in enumerate(levels[-1]):
                for ch in node.children:
                    nxt.append((ch, pi))
            if not nxt:
                break
            levels.append(nxt)
        words_l, dir_l, offs_l, par_l = [], [], [], []
        leaf_level = np.zeros(brwt.num_labels, np.int32)
        leaf_node = np.zeros(brwt.num_labels, np.int32)
        for li, level in enumerate(levels):
            words, rdir, offs, pars = [], [], [], []
            woff = 0
            for ni, (node, pi) in enumerate(level):
                bm = np.asarray(node.bitmap, dtype=bool)
                nw = max((len(bm) + 31) // 32, 1)
                w = np.zeros(nw * 32, dtype=bool)
                w[: len(bm)] = bm
                packed = np.packbits(w.reshape(nw, 32), axis=1,
                                     bitorder="little").view(np.uint32)[:, 0]
                pc = np.concatenate(
                    [[0], np.cumsum([bin(int(x)).count("1")
                                     for x in packed])[:-1]]).astype(np.int32)
                words.append(packed)
                rdir.append(pc)
                offs.append(woff)
                pars.append(pi)
                woff += nw
                if not node.children:
                    leaf_level[node.labels[0]] = li
                    leaf_node[node.labels[0]] = ni
            words_l.append(jnp.asarray(np.concatenate(words)))
            dir_l.append(jnp.asarray(np.concatenate(rdir)))
            offs_l.append(jnp.asarray(np.array(offs, np.int32)))
            par_l.append(np.array(pars, np.int32))
        return cls(words_l, dir_l, offs_l, par_l, leaf_level, leaf_node,
                   brwt.num_rows, brwt.num_labels)

    @property
    def depth(self):
        return len(self.words)


def _bit_and_rank(words, rdir, offs, state):
    """state: (Q, n) local row per node (-1 dead) -> (bit set, rank1-1)."""
    alive = state >= 0
    r = jnp.maximum(state, 0)
    widx = offs[None, :] + (r >> 5)
    w = words[widx]
    bitpos = (r & 31).astype(jnp.uint32)
    bit = ((w >> bitpos) & 1).astype(bool) & alive
    below = w & ((jnp.uint32(1) << bitpos) - jnp.uint32(1))
    rank_excl = rdir[widx] + jax.lax.population_count(below).astype(jnp.int32)
    return bit, rank_excl      # rank1(row)-1 == exclusive rank when bit set


def brwt_row_words(dev: DeviceBRWT, rows: jnp.ndarray) -> jnp.ndarray:
    """(Q,) row ids (-1 = miss) -> (Q, ceil(L/32)) packed label words.

    Fixed-depth descend: level l keeps a (Q, n_l) matrix of node-local rows
    (-1 dead); the leaf bits assemble into packed words with one dot per
    word (ref brwt.cpp slice_rows, batched)."""
    Q = rows.shape[0]
    L = dev.num_labels
    Lw = max((L + 31) // 32, 1)
    state = jnp.where(rows[:, None] >= 0, rows[:, None], -1)   # (Q, 1)
    leaf_bits = jnp.zeros((Q, Lw * 32), dtype=jnp.uint32)
    leaf_level = np.asarray(dev.leaf_level)
    leaf_node = np.asarray(dev.leaf_node)
    for l in range(dev.depth):
        bit, reduced = _bit_and_rank(dev.words[l], dev.rank_dir[l],
                                     dev.offs[l], state)
        # emit leaves that live at this level: one column scatter
        lv_labels = np.flatnonzero(leaf_level == l)
        if len(lv_labels):
            leaf_bits = leaf_bits.at[:, lv_labels].set(
                bit[:, leaf_node[lv_labels]].astype(jnp.uint32))
        if l + 1 < dev.depth:
            nxt = jnp.where(bit, reduced, -1)                  # (Q, n_l)
            state = nxt[:, np.asarray(dev.parent[l + 1])]      # (Q, n_{l+1})
    # pack: (Q, Lw, 32) dot 2^j
    powers = jnp.asarray((np.uint64(1) << np.arange(32, dtype=np.uint64))
                         .astype(np.uint32))
    return jnp.sum(leaf_bits.reshape(Q, Lw, 32) * powers[None, None, :],
                   axis=2, dtype=jnp.uint32)


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceRowDiff:
    succ: jnp.ndarray        # (R,) int32, -1 = anchor/none
    anchors: jnp.ndarray     # (R,) bool
    inner: object            # DeviceBRWT or DeviceAnnotation-like
    max_depth: int
    num_labels: int

    def tree_flatten(self):
        return ((self.succ, self.anchors, self.inner),
                (self.max_depth, self.num_labels))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], *aux)

    @classmethod
    def from_host(cls, rd, inner_dev) -> "DeviceRowDiff":
        succ = np.asarray(rd.succ, dtype=np.int32)
        anchors = np.asarray(rd.anchors, dtype=bool)
        # walk-length bound: longest successor chain to an anchor, computed
        # by fixpoint iteration (the anchor assignment keeps chains short)
        depth = np.zeros(len(succ), np.int64)
        for _ in range(len(succ) + 1):
            nd = np.where(anchors | (succ < 0), 0,
                          depth[np.maximum(succ, 0)] + 1)
            if np.array_equal(nd, depth):
                break
            depth = nd
        else:
            raise ValueError("row-diff routing does not terminate")
        return cls(jnp.asarray(succ), jnp.asarray(anchors), inner_dev,
                   int(depth.max()) + 1, rd.num_labels)


def rowdiff_row_words(dev: DeviceRowDiff, rows: jnp.ndarray,
                      inner_words_fn) -> jnp.ndarray:
    """(Q,) rows -> packed label words via the bounded anchor walk."""
    Q = rows.shape[0]
    L = dev.num_labels
    Lw = max((L + 31) // 32, 1)

    def body(_, carry):
        acc, cur, active = carry
        safe = jnp.maximum(cur, 0)
        w = inner_words_fn(jnp.where(active, safe, -1))
        acc = acc ^ jnp.where(active[:, None], w, 0)
        stop = dev.anchors[safe] | (dev.succ[safe] < 0)
        nxt = dev.succ[safe]
        active = active & ~stop & (nxt >= 0)
        return acc, jnp.where(active, nxt, -1), active

    acc = jnp.zeros((Q, Lw), dtype=jnp.uint32)
    active = rows >= 0
    acc, _, _ = jax.lax.fori_loop(0, dev.max_depth, body,
                                  (acc, jnp.where(active, rows, -1), active))
    return acc


# ------------------------------------------------------------- count epochs
def dense_row_words(dev, rows: jnp.ndarray) -> jnp.ndarray:
    """row-words fn for the dense DeviceAnnotation bitmap (rows: -1 = miss)."""
    from . import ops as anno_ops
    w = anno_ops.gather_anno_rows(dev.bitmap, jnp.maximum(rows, 0),
                                  dev.num_labels)
    return jnp.where((rows >= 0)[:, None], w, 0)


def brwt_words_fn(dev, rows):
    return brwt_row_words(dev, rows)


def rowdiff_dense_words_fn(dev, rows):
    return rowdiff_row_words(dev, rows,
                             lambda r: dense_row_words(dev.inner, r))


def rowdiff_brwt_words_fn(dev, rows):
    return rowdiff_row_words(dev, rows,
                             lambda r: brwt_row_words(dev.inner, r))


_epoch_cache = {}


def make_tiled_count_epoch(row_words):
    """Tiled per-sequence label counting over ANY device row-words source
    (dense bitmap / BRWT descend / row-diff walk) — the same fused
    gather -> bit-expand -> tile-sum -> fold pipeline as
    query/device.py count_epoch_tiled."""
    if row_words in _epoch_cache:
        return _epoch_cache[row_words]

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def epoch(dev, nodes, tile_seq, num_seqs, num_labels):
        N, T = nodes.shape
        C = max(1, (1 << 15) // T)
        pad = (-N) % C
        if pad:
            nodes = jnp.concatenate([nodes, jnp.zeros((pad, T), nodes.dtype)])
            tile_seq = jnp.concatenate(
                [tile_seq, jnp.zeros(pad, tile_seq.dtype)])
        nc = nodes.shape[0] // C
        shifts = jnp.arange(32, dtype=jnp.uint32)

        def body(carry, nn):
            hit = nn > 0
            rows = jnp.where(hit, nn - 1, -1).reshape(C * T)
            words = row_words(dev, rows).reshape(C, T, -1)
            Lw = words.shape[-1]
            bits = ((words[..., None] >> shifts) & 1).astype(jnp.int32)
            bits = bits.reshape(C, T, Lw * 32)[..., :num_labels]
            return carry, (bits.sum(axis=1),
                           hit.sum(axis=1, dtype=jnp.int32))
        _, (tc, th) = jax.lax.scan(body, 0, nodes.reshape(nc, C, T))
        tile_counts = tc.reshape(nc * C, num_labels).astype(jnp.float32)
        tile_hit = th.reshape(nc * C).astype(jnp.float32)
        onehot = (tile_seq[:, None]
                  == jnp.arange(num_seqs, dtype=tile_seq.dtype)[None, :]
                  ).astype(jnp.float32)
        counts = jax.lax.dot_general(onehot, tile_counts,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        present = jnp.sum(onehot * tile_hit[:, None], axis=0)
        return counts.astype(jnp.int32), present.astype(jnp.int32)

    _epoch_cache[row_words] = epoch
    return epoch


# ------------------------------------------------- dynamic-structure BRWT
# DeviceBRWT above encodes the tree SHAPE in Python (static leaf scatter
# per level, static parent maps) — correct, but the generated HLO grows
# with the tree and a 1000-label tree took ~4 min to compile on the relay.
# DynDeviceBRWT keeps ALL structure as device arrays (node offsets, parent
# maps, per-label leaf positions), so the descent is a small fixed program
# regardless of label count — the same formulation the mesh-sharded label
# forest uses (parallel/sharding.py ShardedBRWT).


def flatten_brwt(brwt):
    """Host BRWT -> per-level (words, rank_dir, offs, parent) numpy arrays
    + per-label (leaf_level, leaf_node).  Shared by DynDeviceBRWT and the
    mesh-sharded forest."""
    levels = [[(brwt.root, -1)]]
    while True:
        nxt = []
        for pi, (node, _) in enumerate(levels[-1]):
            for ch in node.children:
                nxt.append((ch, pi))
        if not nxt:
            break
        levels.append(nxt)
    leaf_level = np.full(max(brwt.num_labels, 1), -1, np.int32)
    leaf_node = np.full(max(brwt.num_labels, 1), -1, np.int32)
    flat = []
    for li, level in enumerate(levels):
        words, rdir, offs, pars = [], [], [], []
        woff = 0
        for ni, (node, pi) in enumerate(level):
            bm = np.asarray(node.bitmap, dtype=bool)
            nw = max((len(bm) + 31) // 32, 1)
            wv = np.zeros(nw * 32, dtype=bool)
            wv[: len(bm)] = bm
            packed = np.packbits(wv.reshape(nw, 32), axis=1,
                                 bitorder="little").view(np.uint32)[:, 0]
            pc = np.concatenate(
                [[0], np.cumsum([bin(int(x)).count("1") for x in packed]
                                )[:-1]]).astype(np.int32)
            words.append(packed)
            rdir.append(pc)
            offs.append(woff)
            pars.append(pi)
            woff += nw
            if not node.children:
                leaf_level[node.labels[0]] = li
                leaf_node[node.labels[0]] = ni
        flat.append((np.concatenate(words),
                     np.concatenate(rdir).astype(np.int32),
                     np.array(offs, np.int32), np.array(pars, np.int32)))
    return flat, leaf_level, leaf_node


def dyn_brwt_descend(words_l, rdir_l, offs_l, par_l, lv_nodes, lv_counts,
                     inv_perm, rows, num_labels: int):
    """Dynamic Multi-BRWT descent: (Q,) row ids (-1 = miss) ->
    (Q, ceil(L/32)) packed label words.  Tree structure is device data;
    the program size is O(depth), independent of node/label count.

    Leaf emission: labels are host-sorted by leaf level, so each level
    contributes one (Q, cnt_l) column gather (lv_nodes[l]); the final
    static inv_perm gather restores label order — no (D, Q, nodes)
    bit stack."""
    Q = rows.shape[0]
    D = len(words_l)
    Lw = max(-(-num_labels // 32), 1)
    if D == 0:
        return jnp.zeros((Q, Lw), jnp.uint32)
    state = jnp.where(rows[:, None] >= 0, rows[:, None], -1)
    parts = []
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
        if lv_counts[l]:
            parts.append(jnp.take(bit, lv_nodes[l], axis=1))
        if l + 1 < D:
            nxt = jnp.where(bit, rank_excl, -1)
            par = par_l[l + 1]
            taken = jnp.take(nxt, jnp.maximum(par, 0), axis=1)
            state = jnp.where(par[None, :] >= 0, taken, -1)
    lbits = jnp.concatenate(parts, axis=1)[:, inv_perm]      # (Q, L)
    pad = Lw * 32 - lbits.shape[1]
    if pad:
        lbits = jnp.concatenate(
            [lbits, jnp.zeros((Q, pad), bool)], axis=1)
    powers = jnp.asarray((np.uint64(1) << np.arange(32, dtype=np.uint64))
                         .astype(np.uint32))
    return jnp.sum(lbits.reshape(Q, Lw, 32) * powers[None, None, :],
                   axis=2, dtype=jnp.uint32)


@jax.tree_util.register_pytree_node_class
@dataclass
class DynDeviceBRWT:
    words: tuple          # per level (Wmax_l,) uint32
    rdir: tuple
    offs: tuple
    parent: tuple
    lv_nodes: tuple       # per level (cnt_l,) int32 leaf node ids
    inv_perm: jnp.ndarray  # (L,) label-order restore permutation
    lv_counts: tuple      # static: labels terminating per level
    num_rows: int
    num_labels: int

    def tree_flatten(self):
        return ((self.words, self.rdir, self.offs, self.parent,
                 self.lv_nodes, self.inv_perm),
                (self.lv_counts, self.num_rows, self.num_labels))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_host(cls, brwt) -> "DynDeviceBRWT":
        flat, ll, ln = flatten_brwt(brwt)
        L = brwt.num_labels
        order = np.argsort(ll[:L], kind="stable")      # labels by leaf level
        inv = np.empty(L, np.int64)
        inv[order] = np.arange(L)
        lv_nodes, lv_counts = [], []
        pos = 0
        for l in range(len(flat)):
            cnt = int((ll[:L] == l).sum())
            lv_nodes.append(jnp.asarray(
                ln[order[pos: pos + cnt]].astype(np.int32)))
            lv_counts.append(cnt)
            pos += cnt
        return cls(tuple(jnp.asarray(f[0]) for f in flat),
                   tuple(jnp.asarray(f[1]) for f in flat),
                   tuple(jnp.asarray(f[2]) for f in flat),
                   tuple(jnp.asarray(f[3]) for f in flat),
                   tuple(lv_nodes), jnp.asarray(inv.astype(np.int32)),
                   tuple(lv_counts), brwt.num_rows, L)


def dyn_brwt_words_fn(dev, rows):
    return dyn_brwt_descend(dev.words, dev.rdir, dev.offs, dev.parent,
                            dev.lv_nodes, dev.lv_counts, dev.inv_perm,
                            rows, dev.num_labels)


def rowdiff_dyn_brwt_words_fn(dev, rows):
    return rowdiff_row_words(dev, rows,
                             lambda r: dyn_brwt_words_fn(dev.inner, r))
