"""Device-real sharded BOSS construction back half.

Round 3 proved the sharded back half bit-exact with a HOST model of the
exchanges (parallel/build.py sharded_generate_dummies/_exchange — python
loops).  This module moves the whole back half onto the device mesh
(VERDICT r3 next #2): every inter-shard move is a real collective
(lax.all_to_all for dummy/edge routing, all_gather for emission halos,
psum for the F counts), and the local work (sort, unique, membership,
minus/last emission) is jnp inside shard_map.  On a pod the same program
rides ICI/DCN.  Ref: boss_chunk_construct.cpp:1020-1120 (per-suffix chunk
pipeline), boss_chunk.cpp:33-133 (row emission).

Data layout: char matrices (rows of uint8 codes, 0=$ .. alph-1; PADC=15
pads) travel through the collectives; packed keys (uint32 words in the
SAME hi/lo-split layout the host pack_codes produces) are recomputed
locally for sort/compare.  Fixed per-(src,dst) bucket caps keep buffers
O(N/m) per shard; overflow sets a flag and the caller falls back to the
host model (never wrong, just slower).

All stages are cached per (mesh, shape) — shard_map closures recompile
otherwise.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..kmer import packing

PADC = 15            # pad char: > any real code at 4-bit packing, sorts last

# collective log for the dryrun's communication-volume report:
# (stage, collective, count, bytes_per_shard)
COLLECTIVE_LOG: list = []


def _log_collective(stage: str, kind: str, nbytes: int):
    COLLECTIVE_LOG.append((stage, kind, 1, int(nbytes)))


def reset_collective_log():
    COLLECTIVE_LOG.clear()


def collective_summary():
    """-> {(stage, kind): (count, total_bytes_per_shard)}"""
    out = {}
    for stage, kind, c, b in COLLECTIVE_LOG:
        k = (stage, kind)
        cc, bb = out.get(k, (0, 0))
        out[k] = (cc + c, bb + b)
    return out


def _ceil_div(a, b):
    return -(-a // b)


def _w32(n_chars: int) -> int:
    return max(_ceil_div(n_chars, 8), 1)


def _pack_rows_j(chars: jnp.ndarray, order, out_words: int) -> jnp.ndarray:
    """(N, K) int codes -> (N, out_words) uint32, 4 bits/char, word 0 most
    significant, first ordered char in the top nibble (the hi/lo split of
    the host pack_codes uint64 layout)."""
    N = chars.shape[0]
    K = len(order)
    words = []
    for w in range(out_words):
        acc = jnp.zeros((N,), dtype=jnp.uint32)
        for s in range(8):
            j = w * 8 + s
            if j >= K:
                break
            acc = acc | (chars[:, order[j]].astype(jnp.uint32)
                         << np.uint32(28 - 4 * s))
        words.append(acc)
    return jnp.stack(words, axis=1)


def _sort_by_key(keys: jnp.ndarray, *payloads):
    """Sort rows by multiword key (stable); payloads gathered along."""
    N, W = keys.shape
    idx = jnp.arange(N, dtype=jnp.int32)
    cols = tuple(keys[:, w] for w in range(W)) + (idx,)
    out = lax.sort(cols, num_keys=W, is_stable=True)
    sidx = out[-1]
    skeys = jnp.stack(out[:W], axis=1)
    return (skeys, sidx) + tuple(p[sidx] for p in payloads)


def _rows_ne(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.any(a != b, axis=-1)


def _unique_mask(sorted_keys: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """First-occurrence mask over sorted rows (pads excluded via valid)."""
    prev = jnp.concatenate(
        [jnp.full((1, sorted_keys.shape[1]), 0xFFFFFFFF, sorted_keys.dtype),
         sorted_keys[:-1]], axis=0)
    new = _rows_ne(sorted_keys, prev)
    new = new.at[0].set(True)
    return new & valid


def _rows_in_j(sorted_keys: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Membership of query rows in SORTED rows (pads sort last and never
    equal a real query).  Lockstep multiword binary search."""
    N, W = sorted_keys.shape
    Q = queries.shape[0]
    steps = max(int(math.ceil(math.log2(max(N + 1, 2)))), 1)

    def lt(a, b):          # a < b lexicographic
        return packing.rows_lex_lt(a, b, xp=jnp)

    def body(_, st):
        lo, hi = st
        mid = (lo + hi) >> 1
        kmid = sorted_keys[jnp.clip(mid, 0, N - 1)]
        less = lt(kmid, queries)
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo = jnp.zeros(Q, dtype=jnp.int32)
    hi = jnp.full(Q, N, dtype=jnp.int32)
    lo, hi = lax.fori_loop(0, steps, body, (lo, hi))
    pos = jnp.clip(lo, 0, N - 1)
    return (lo < N) & jnp.all(sorted_keys[pos] == queries, axis=-1)


def _dest_of(keys: jnp.ndarray, bounds: jnp.ndarray, m: int) -> jnp.ndarray:
    dest = jnp.zeros(keys.shape[0], dtype=jnp.int32)
    for b in range(m - 1):
        dest = dest + packing.rows_lex_gt(keys, bounds[b], xp=jnp).astype(
            jnp.int32)
    return dest


def _place_and_exchange(rows: jnp.ndarray, dest: jnp.ndarray,
                        valid: jnp.ndarray, m: int, cap: int):
    """Bucket rows by dest into (m, cap, D) with PADC padding, all_to_all,
    return ((m*cap, D) received rows, overflow flag, rows actually
    sent — the REAL traffic behind the padded buffer, for the dryrun's
    model-vs-actual collective accounting)."""
    D = rows.shape[1]
    dest = jnp.where(valid, dest, m)            # pads drop (OOB scatter)
    order = jnp.argsort(dest, stable=True)
    rs = rows[order]
    ds = dest[order]
    starts = jnp.searchsorted(ds, jnp.arange(m + 1, dtype=ds.dtype))
    slot = jnp.arange(rows.shape[0], dtype=jnp.int32) \
        - starts[jnp.clip(ds, 0, m)].astype(jnp.int32)
    overflow = jnp.any((ds < m) & (slot >= cap))
    send = jnp.full((m, cap, D), PADC, dtype=rows.dtype)
    send = send.at[ds, slot].set(rs, mode="drop")
    recv = lax.all_to_all(send, "shard", split_axis=0, concat_axis=0,
                          tiled=False)
    sent = jnp.sum(ds < m, dtype=jnp.int32)
    return recv.reshape(m * cap, D), overflow, sent


_STAGE_CACHE = {}


def _cached_stage(key, builder):
    fn = _STAGE_CACHE.get(key)
    if fn is None:
        fn = builder()
        _STAGE_CACHE[key] = fn
    return fn


# ----------------------------------------------------------------- stages

def _stage_route_nodes(mesh, m, B, K, cap):
    """Reals -> (src nodes, tgt nodes) routed to node-range owners.

    Node bounds are the edge bounds with the label nibble zeroed, so a
    shard's SOURCE nodes are its own except boundary strays (the front
    half partitioned edges by (node, label) key) — only targets and the
    few strays travel through the all_to_all.  Returns (local src rows,
    received rows, overflow)."""
    Wn = _w32(K - 1)
    colex = list(range(K - 2, -1, -1))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("shard", None), P(None, None)),
        out_specs=(P("shard", None), P("shard", None), P("shard"),
                   P("shard")),
        check_vma=False)
    def step(codes, node_bounds):
        codes = codes.astype(jnp.uint8)
        me = lax.axis_index("shard")
        valid = codes[:, 0] != PADC
        srcs = codes[:, : K - 1]
        tgts = codes[:, 1:]
        tag = jnp.concatenate([jnp.zeros(B, jnp.uint8),
                               jnp.ones(B, jnp.uint8)])
        rows = jnp.concatenate(
            [jnp.concatenate([srcs, tgts], axis=0),
             tag[:, None]], axis=1)                      # (2B, K)
        nodes = rows[:, : K - 1].astype(jnp.int32)
        keys = _pack_rows_j(nodes, colex, Wn)
        dest = _dest_of(keys, node_bounds, m)
        # sources that stay home skip the exchange entirely
        vcat = jnp.concatenate([valid, valid])
        is_src = rows[:, K - 1] == 0
        local_src = is_src & vcat & (dest == me)
        send_sel = vcat & ~local_src
        recv, ovf, sent = _place_and_exchange(rows, dest, send_sel, m,
                                              cap)
        local = jnp.where(local_src[:, None], rows, PADC)[:B]
        return local, recv, ovf[None], sent[None]

    return jax.jit(step)


def _stage_local_dummies(mesh, m, R, K, cap_d):
    """Local + received (R, K) [node chars | tag] -> per-shard dummy sinks
    + level-1 dummy sources, compacted to cap_d rows each."""
    Wn = _w32(K - 1)
    colex = list(range(K - 2, -1, -1))

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P("shard", None), P("shard", None)),
                       out_specs=(P("shard", None), P("shard", None),
                                  P("shard")), check_vma=False)
    def step(local, recv):
        recv = jnp.concatenate(
            [local.astype(jnp.uint8), recv.astype(jnp.uint8)], axis=0)
        chars = recv[:, : K - 1]
        tag = recv[:, K - 1]
        valid = chars[:, 0] != PADC
        keys = _pack_rows_j(chars.astype(jnp.int32), colex, Wn)
        padkey = jnp.full((Wn,), 0xFFFFFFFF, jnp.uint32)

        def uniq(sel):
            k = jnp.where(sel[:, None], keys, padkey[None, :])
            sk, _, sc, sv = _sort_by_key(k, chars, sel)
            new = _unique_mask(sk, sv)
            # re-sort uniques to the front (pads to the back), keep order
            k2 = jnp.where(new[:, None], sk, padkey[None, :])
            uk, _, uc, un = _sort_by_key(k2, sc, new)
            return uk, uc, un

        sk_u, s_chars, s_ok = uniq(valid & (tag == 0))
        tk_u, t_chars, t_ok = uniq(valid & (tag == 1))

        # dummy sinks: unique target nodes with no outgoing real edge
        sink_sel = t_ok & ~_rows_in_j(sk_u, tk_u)
        sinks = jnp.concatenate(
            [t_chars, jnp.zeros((R, 1), jnp.uint8)], axis=1)
        sinks = jnp.where(sink_sel[:, None], sinks, PADC)

        # dummy-1 sources: unique source nodes with no incoming real edge
        lvl_sel = s_ok & ~_rows_in_j(tk_u, sk_u)
        lvl = jnp.concatenate(
            [jnp.zeros((R, 1), jnp.uint8), s_chars], axis=1)
        lvl = jnp.where(lvl_sel[:, None], lvl, PADC)

        def compact(rows, sel):
            order = jnp.argsort(~sel, stable=True)
            return rows[order][:cap_d], jnp.sum(sel) > cap_d

        sinks_c, ovf1 = compact(sinks, sink_sel)
        lvl_c, ovf2 = compact(lvl, lvl_sel)
        return sinks_c, lvl_c, (ovf1 | ovf2)[None]

    return jax.jit(step)


def _stage_route_level(mesh, m, Bl, K, cap, cap_d):
    """One dummy-source level: route node prefixes to owners, unique,
    prepend '$' -> next level (ref construct.generate_dummy_kmers level
    loop; each round = one all_to_all)."""
    Wn = _w32(K - 1)
    colex = list(range(K - 2, -1, -1))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("shard", None), P(None, None)),
        out_specs=(P("shard", None), P("shard"), P("shard")),
        check_vma=False)
    def step(lvl, node_bounds):
        lvl = lvl.astype(jnp.uint8)
        valid = lvl[:, 0] != PADC
        nodes = lvl[:, : K - 1]
        keys = _pack_rows_j(nodes.astype(jnp.int32), colex, Wn)
        dest = _dest_of(keys, node_bounds, m)
        recv, ovf1, sent = _place_and_exchange(nodes, dest, valid, m,
                                               cap)
        rvalid = recv[:, 0] != PADC
        rkeys = _pack_rows_j(recv.astype(jnp.int32), colex, Wn)
        padkey = jnp.full((Wn,), 0xFFFFFFFF, jnp.uint32)
        k = jnp.where(rvalid[:, None], rkeys, padkey[None, :])
        sk, _, sc, sv = _sort_by_key(k, recv, rvalid)
        new = _unique_mask(sk, sv)
        nxt = jnp.concatenate(
            [jnp.zeros((recv.shape[0], 1), jnp.uint8), sc], axis=1)
        nxt = jnp.where(new[:, None], nxt, PADC)
        order = jnp.argsort(~new, stable=True)
        out = nxt[order][:cap_d]
        ovf2 = jnp.sum(new) > cap_d
        return out, (ovf1 | ovf2)[None], sent[None]

    return jax.jit(step)


def _stage_route_edges(mesh, m, Bd, B, K, cap):
    """Dummies -> edge-range owners; merge with the resident reals; local
    sort in BOSS edge order -> per-shard sorted streams."""
    We = _w32(K)
    border = list(range(K - 2, -1, -1)) + [K - 1]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("shard", None), P("shard", None), P(None, None)),
        out_specs=(P("shard", None), P("shard"), P("shard")),
        check_vma=False)
    def step(dummies, reals, edge_bounds):
        dummies = dummies.astype(jnp.uint8)
        valid = dummies[:, 0] != PADC
        keys = _pack_rows_j(dummies.astype(jnp.int32), border, We)
        dest = _dest_of(keys, edge_bounds, m)
        recv, ovf, sent = _place_and_exchange(dummies, dest, valid, m,
                                              cap)
        stream = jnp.concatenate([reals.astype(jnp.uint8), recv], axis=0)
        svalid = stream[:, 0] != PADC
        skeys = _pack_rows_j(stream.astype(jnp.int32), border, We)
        padkey = jnp.full((We,), 0xFFFFFFFF, jnp.uint32)
        k = jnp.where(svalid[:, None], skeys, padkey[None, :])
        _, _, sc = _sort_by_key(k, stream)
        return sc, ovf[None], sent[None]

    return jax.jit(step)


def _stage_emit(mesh, m, B3, K, alph_size):
    """Per-shard BOSS row emission with device halos: next shard's first
    node key (all_gather), per-label carry of the last target key
    (all_gather + static scan), global F (psum).
    Ref boss_chunk.cpp:33-133 semantics; identical to construct.emit_boss."""
    Wn = _w32(K - 1)
    colex = list(range(K - 2, -1, -1))

    @functools.partial(shard_map, mesh=mesh, in_specs=(P("shard", None),),
                       out_specs=(P("shard", None), P("shard", None)),
                       check_vma=False)
    def step(stream):
        stream = stream.astype(jnp.uint8)
        M = stream.shape[0]
        valid = stream[:, 0] != PADC
        count = jnp.sum(valid.astype(jnp.int32))
        labels = stream[:, K - 1].astype(jnp.int32)
        labels = jnp.where(valid, labels, 0)
        node_last = stream[:, K - 2].astype(jnp.int32)
        first_char = stream[:, 0].astype(jnp.int32)
        nkeys = _pack_rows_j(stream[:, : K - 1].astype(jnp.int32), colex, Wn)
        tkeys = _pack_rows_j(stream[:, 1:].astype(jnp.int32), colex, Wn)

        # halo (a): first node key of the next non-empty shard
        has_rows = (count > 0).astype(jnp.uint32)
        first = jnp.concatenate([nkeys[0], has_rows[None]])[None, :]
        firsts = lax.all_gather(first, "shard", tiled=True)   # (m, Wn+1)
        me = lax.axis_index("shard")
        nxt_key = jnp.full((Wn,), 0xFFFFFFFF, jnp.uint32)
        nxt_has = jnp.zeros((), jnp.bool_)
        for j in range(m - 1, -1, -1):
            # scan right-to-left: the nearest non-empty shard after me wins
            is_after = (j > me) & (firsts[j, Wn] > 0)
            nxt_key = jnp.where(is_after, firsts[j, :Wn], nxt_key)
            nxt_has = jnp.where(is_after, True, nxt_has)

        # halo (b): per label, last target key of any EARLIER shard
        lasts = []
        for c in range(alph_size):
            mask = valid & (labels == c)
            pos = jnp.where(mask, jnp.arange(M, dtype=jnp.int32), -1)
            li = jnp.max(pos)
            has = (li >= 0).astype(jnp.uint32)
            lasts.append(jnp.concatenate(
                [tkeys[jnp.maximum(li, 0)], has[None]]))
        mine = jnp.stack(lasts)[None]                        # (1, a, Wn+1)
        alll = lax.all_gather(mine, "shard", tiled=True)     # (m, a, Wn+1)
        carry_key = jnp.full((alph_size, Wn), 0xFFFFFFFF, jnp.uint32)
        carry_has = jnp.zeros((alph_size,), jnp.bool_)
        for j in range(m):
            is_before = (j < me)
            hasj = alll[j, :, Wn] > 0
            take = is_before & hasj & True
            carry_key = jnp.where(take[:, None], alll[j, :, :Wn], carry_key)
            carry_has = jnp.where(take, True, carry_has)

        # same-node-next: within shard + boundary vs next shard's first
        same_next = jnp.zeros(M, jnp.bool_)
        same_next = same_next.at[:-1].set(
            ~_rows_ne(nkeys[1:], nkeys[:-1]) & valid[1:])
        lastv = jnp.maximum(count - 1, 0)
        boundary_same = nxt_has & (count > 0) \
            & ~jnp.any(nkeys[lastv] != nxt_key)
        same_next = same_next.at[lastv].set(
            jnp.where(count > 0, boundary_same, same_next[lastv]))

        drop = same_next & (labels == 0) & (node_last > 0) & valid
        keep = valid & ~drop
        last_bits = (~same_next).astype(jnp.uint8)

        # minus flags per label with carry halo
        minus = jnp.zeros(M, jnp.bool_)
        arangeM = jnp.arange(M, dtype=jnp.int32)
        for c in range(1, alph_size):
            mask = keep & (labels == c)
            pos = jnp.where(mask, arangeM, -1)
            incl = lax.cummax(pos, axis=0)
            prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), incl[:-1]])
            has_prev = prev >= 0
            same_in = ~jnp.any(
                tkeys != tkeys[jnp.maximum(prev, 0)], axis=1) & has_prev
            same_carry = carry_has[c] & ~has_prev \
                & ~jnp.any(tkeys != carry_key[c][None, :], axis=1)
            minus = minus | (mask & (same_in | same_carry))

        W_full = (labels + jnp.where(minus, alph_size, 0)).astype(jnp.uint8)
        validbit = ((labels > 0) & (first_char > 0)).astype(jnp.uint8)

        # F: global per-label counts of kept rows with node_last < c (psum;
        # int32 is safe below 2^31 edges — one shard's slice of a larger
        # graph, and x64 is disabled on the CPU test mesh)
        fc = []
        for c in range(alph_size):
            fc.append(jnp.sum((keep & (node_last < c)).astype(jnp.int32)))
        F = lax.psum(jnp.stack(fc), "shard")

        out = jnp.stack(
            [W_full, last_bits, validbit, keep.astype(jnp.uint8)], axis=1)
        return out, F[None, :]

    return jax.jit(step)


# ------------------------------------------------------------ orchestration

LAST_COLLECTIVE_REPORT = []


def _check_collective_model(sent_actual: dict, n_real: int, n_dummy: int,
                            m: int, K: int):
    """Model-vs-actual collective-byte check (VERDICT r5 task 9).

    The analytic model (SURVEY section 5.8): routing is O(N) — every real
    edge ships at most its source + target node strings once
    (route-nodes), every dummy node travels at most once per level and
    once to its edge owner.  Actual = REAL rows through each all_to_all
    (counted on device, padding excluded).  Fails if actual exceeds the
    model by more than 2x (+1 KB slack for tiny inputs)."""
    model = {
        "route-nodes": 2 * n_real * K,
        "route-level": (n_dummy + m) * (K - 1),
        "route-edges": (n_dummy + m) * K,
    }
    LAST_COLLECTIVE_REPORT.clear()
    for phase, actual in sent_actual.items():
        mod = model.get(phase, 0)
        ok = actual <= 2 * mod + 1024
        LAST_COLLECTIVE_REPORT.append(
            (phase, actual, mod, "ok" if ok else "EXCEEDS"))
        if not ok:
            raise AssertionError(
                f"collective volume model violated at {phase}: "
                f"actual {actual} B > 2 x model {mod} B")


def sharded_build_boss_device(sequences, k: int, mesh: Mesh | None = None,
                              mode: str = "basic",
                              n_devices: int | None = None,
                              alph_size: int = 5):
    """Fully device-real sharded BOSS construction: the front half's mesh
    sort (all_to_all) feeds a back half whose dummy generation, edge
    routing, and emission halos all run as shard_map collectives.  Arrays
    are bit-identical to succinct.construct.build_boss_arrays (asserted in
    tests/test_multichip.py and the driver dryrun).  Raises RuntimeError on
    bucket-cap overflow (caller falls back to the host-model path)."""
    from .build import _front_half_shards, sample_boundaries
    from ..succinct.construct import BossArrays

    if mesh is None:
        devs = jax.devices()[: n_devices or len(jax.devices())]
        mesh = Mesh(np.array(devs), ("shard",))
    m = mesh.shape["shard"]
    reset_collective_log()

    key_shards, bounds32 = _front_half_shards(sequences, k, mesh, None, mode)
    _log_collective("front-sort", "all_to_all",
                    sum(len(s) for s in key_shards) * 2 * 8 // max(m, 1))
    K = k
    order = packing.boss_priority_order(K)
    shard_codes = [packing.unpack_codes(s, K, order) for s in key_shards]

    # shard-padded real codes (device input): (m*B, K) uint8
    B = max(max((len(s) for s in shard_codes), default=1), 1)
    codes_pad = np.full((m * B, K), PADC, dtype=np.uint8)
    for i, s in enumerate(shard_codes):
        codes_pad[i * B: i * B + len(s)] = s

    # node-range boundaries: the EDGE bounds with the label nibble zeroed,
    # so every shard's source nodes are its own (modulo boundary strays) —
    # edges were range-partitioned by (node, label) key in the front half
    bits = packing.bits_for_alphabet(alph_size)
    Wn = _w32(K - 1)
    We = _w32(K)
    eb32 = bounds32[:, : We] if m > 1 else np.zeros((0, We), np.uint32)
    node_bounds = eb32[:, :Wn].copy()
    lw, ls = (K - 1) // 8, (K - 1) % 8
    if lw < Wn:
        node_bounds[:, lw] &= ~np.uint32(0xF << (28 - 4 * ls))
    nb = np.ascontiguousarray(
        node_bounds if m > 1 else np.zeros((1, Wn), np.uint32))
    eb = np.ascontiguousarray(eb32 if m > 1 else np.zeros((1, We), np.uint32))

    def _host_key32(chars, order, Wout):
        if len(chars) == 0:
            return np.zeros((0, Wout), np.uint32)
        kk = packing.pack_codes(chars, order, bits=bits)
        k32 = np.empty((len(kk), kk.shape[1] * 2), np.uint32)
        k32[:, 0::2] = (kk >> np.uint64(32)).astype(np.uint32)
        k32[:, 1::2] = (kk & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        return k32[:, :Wout]

    def _host_dest(keys32, bounds):
        dest = np.zeros(len(keys32), np.int64)
        for b in range(len(bounds)):
            dest += packing.rows_lex_gt(keys32, bounds[b], xp=np)
        return dest

    def _pair_cap(per_src_dest_counts, lo=64):
        cap = int(max(per_src_dest_counts, default=0))
        return 1 << max(int(np.ceil(np.log2(max(cap, 1)))),
                        int(np.log2(lo)))

    colex_o = packing.colex_priority_order(K - 1)
    # exact per-(src,dst) pair cap for the node exchange (pow2-bucketed so
    # jit programs are reused across batches)
    pair_counts = []
    for i, s in enumerate(shard_codes):
        if not len(s):
            continue
        sd = _host_dest(_host_key32(s[:, : K - 1], colex_o, Wn),
                        node_bounds if m > 1 else nb[:0])
        td = _host_dest(_host_key32(s[:, 1:], colex_o, Wn),
                        node_bounds if m > 1 else nb[:0])
        sends = np.concatenate([sd[sd != i], td])
        pair_counts.append(np.bincount(sends, minlength=m).max()
                           if len(sends) else 0)
    cap1 = _pair_cap(pair_counts)

    shard_sh = NamedSharding(mesh, P("shard", None))
    repl_sh = NamedSharding(mesh, P(None, None))
    codes_d = jax.device_put(codes_pad, shard_sh)
    nb_d = jax.device_put(nb, repl_sh)
    eb_d = jax.device_put(eb, repl_sh)
    meshkey = tuple(d.id for d in mesh.devices.flat)

    # stage 1: route tgt nodes (+ boundary-stray srcs) to owners
    s1 = _cached_stage(("s1", meshkey, m, B, K, cap1),
                       lambda: _stage_route_nodes(mesh, m, B, K, cap1))
    local1, recv1, ovf1, sent1 = s1(codes_d, nb_d)
    _log_collective("route-nodes", "all_to_all", m * cap1 * K)
    sent_actual = {"route-nodes": int(np.asarray(sent1).sum()) * K}

    # stage 2: per-owner sinks + level-1 dummy sources
    R = B + m * cap1
    cap_d = max(2 * B, 256)
    s2 = _cached_stage(("s2", meshkey, m, R, K, cap_d),
                       lambda: _stage_local_dummies(mesh, m, R, K, cap_d))
    sinks_d, lvl_d, ovf2 = s2(local1, recv1)

    # stage 3: level loop (k-1 more rounds, one all_to_all each)
    cap3 = max(_ceil_div(4 * cap_d, m), 64)
    s3 = _cached_stage(("s3", meshkey, m, cap_d, K, cap3),
                       lambda: _stage_route_level(mesh, m, cap_d, K, cap3,
                                                  cap_d))
    level_outs = [lvl_d]
    ovfs = {"route-nodes": ovf1, "local-dummies": ovf2}
    for r in range(2, K):
        lvl_d, ovf, sentl = s3(lvl_d, nb_d)
        _log_collective("route-level", "all_to_all", m * cap3 * (K - 1))
        sent_actual["route-level"] = sent_actual.get("route-level", 0) \
            + int(np.asarray(sentl).sum()) * (K - 1)
        level_outs.append(lvl_d)
        ovfs[f"level-{r}"] = ovf

    # stage 4: all dummies + the all-$ row -> edge owners; sort streams
    parts = [np.asarray(sinks_d)] + [np.asarray(x) for x in level_outs]
    dummies_h = np.concatenate(
        [p.reshape(m, -1, K) for p in parts], axis=1)      # (m, Bd, K)
    # the all-$ row enters at shard 0 (its edge key 0 routes to shard 0)
    allq = np.full((m, 1, K), PADC, np.uint8)
    allq[0, 0, :] = 0
    dummies_h = np.concatenate([dummies_h, allq], axis=1)
    Bd = dummies_h.shape[1]
    # exact pair cap for the edge exchange ($-prefixed dummies concentrate
    # on the low shards — the final table puts them first — so pair loads
    # are skewed by construction; pow2-bucketed exact caps keep buffers
    # tight without overflowing)
    border_o = packing.boss_priority_order(K)
    pair4 = []
    for i in range(m):
        rows_i = dummies_h[i]
        rows_i = rows_i[rows_i[:, 0] != PADC]
        if not len(rows_i):
            continue
        dd = _host_dest(_host_key32(rows_i, border_o, We),
                        eb32 if m > 1 else eb[:0])
        pair4.append(np.bincount(dd, minlength=m).max())
    cap4 = _pair_cap(pair4, lo=256)
    dummies_d = jax.device_put(dummies_h.reshape(m * Bd, K), shard_sh)
    s4 = _cached_stage(("s4", meshkey, m, Bd, B, K, cap4),
                       lambda: _stage_route_edges(mesh, m, Bd, B, K, cap4))
    stream_d, ovf4, sent4 = s4(dummies_d, codes_d, eb_d)
    _log_collective("route-edges", "all_to_all", m * cap4 * K)
    sent_actual["route-edges"] = int(np.asarray(sent4).sum()) * K
    ovfs["route-edges"] = ovf4

    # stage 5: emission with device halos
    B3 = B + m * cap4
    s5 = _cached_stage(("s5", meshkey, m, B3, K, alph_size),
                       lambda: _stage_emit(mesh, m, B3, K, alph_size))
    rows_d, F_d = s5(stream_d)
    _log_collective("emit-halo", "all_gather",
                    m * (_w32(K - 1) + 1) * 4 * (1 + alph_size))
    _log_collective("emit-F", "psum", alph_size * 8)

    blown = [name for name, o in ovfs.items() if bool(np.asarray(o).any())]
    if blown:
        raise RuntimeError("sharded_build_boss_device: bucket cap overflow "
                           f"at {blown} (unbalanced ranges); use the "
                           "host-model path")

    rows = np.asarray(rows_d).reshape(m, B3, 4)
    W_parts, last_parts, valid_parts = [], [], []
    for i in range(m):
        kp = rows[i, :, 3].astype(bool)
        W_parts.append(rows[i, kp, 0])
        last_parts.append(rows[i, kp, 1])
        valid_parts.append(rows[i, kp, 2])
    W = np.concatenate([[0]] + W_parts).astype(np.uint8)
    last = np.concatenate([[0]] + last_parts).astype(np.uint8)
    valid = np.concatenate([[0]] + valid_parts).astype(np.uint8)
    F = np.asarray(F_d)[0].astype(np.int64)
    arrays = BossArrays(k=K - 1, alph_size=alph_size, W=W, last=last, F=F,
                        valid=valid)
    n_real = sum(len(x) for x in shard_codes)
    n_dummy = int((dummies_h[:, :, 0] != PADC).sum())
    _check_collective_model(sent_actual, n_real, n_dummy, m, K)
    return arrays
