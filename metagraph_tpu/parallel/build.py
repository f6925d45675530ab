"""Mesh-sharded graph construction.

The reference shards construction by k-mer suffix: workers bucket k-mers
into per-suffix chunk files, sort each chunk, and concatenate
(ref boss_chunk_construct.cpp:1020-1120, cli/build.cpp:110-158).  The mesh
equivalent is a range partition of the packed k-mer key space:

  1. sample split boundaries on host (quantiles of a key sample)
  2. every device buckets its local slice by destination range
  3. one all_to_all exchanges the buckets over the ICI mesh axis
  4. each device sorts + dedupes its received range (lax.sort multiword)
  5. concatenating the shard outputs in axis order yields the globally
     sorted unique k-mer set — byte-identical to the single-device sort

Sentinel rows (all-0xFFFFFFFF) pad every fixed-size buffer; they route to
the last shard, sort last, and are dropped on host.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

SENTINEL = np.uint32(0xFFFFFFFF)


def sample_boundaries(keys: np.ndarray, m: int,
                      sample: int = 1 << 16) -> np.ndarray:
    """(m-1, W) split rows: quantiles of a sorted host sample."""
    from ..kmer import packing
    n = len(keys)
    if n == 0 or m <= 1:
        return np.zeros((max(m - 1, 0), keys.shape[1]), dtype=keys.dtype)
    idx = np.linspace(0, n - 1, min(sample, n)).astype(np.int64)
    smp = keys[idx]
    smp = smp[packing.lexsort_rows(smp)]
    cuts = np.linspace(0, len(smp) - 1, m + 1).astype(np.int64)[1:-1]
    return smp[cuts]


def _rows_greater_j(rows: jnp.ndarray, cut: jnp.ndarray) -> jnp.ndarray:
    """rows > cut lexicographically (shared loop in kmer/packing.py)."""
    from ..kmer import packing
    return packing.rows_lex_gt(rows, cut, xp=jnp)


_SORT_FN_CACHE = {}


def sharded_sort_unique_fn(mesh: Mesh, m: int, B: int, W: int):
    """Jitted sharded sort: (m*B, W) keys sharded over 'shard' ->
    per-shard sorted rows + uniqueness mask, range-exchanged via all_to_all.
    Cached per (mesh devices, m, B, W) — rebuilding the shard_map closure
    forces a full XLA recompile otherwise."""
    key = (tuple(d.id for d in mesh.devices.flat), m, B, W)
    cached = _SORT_FN_CACHE.get(key)
    if cached is not None:
        return cached

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("shard", None), P(None, None)),
        out_specs=(P("shard", None), P("shard")), check_vma=False)
    def _step(local, boundaries):
        # destination shard per row: #boundaries the row exceeds
        dest = jnp.zeros(B, dtype=jnp.int32)
        for b in range(m - 1):
            dest = dest + _rows_greater_j(local, boundaries[b]).astype(
                jnp.int32)
        # group rows by destination: stable sort by dest
        order = jnp.argsort(dest, stable=True)
        rows_sorted = local[order]
        dest_sorted = dest[order]
        starts = jnp.searchsorted(dest_sorted,
                                  jnp.arange(m, dtype=dest.dtype))
        slot = jnp.arange(B, dtype=jnp.int32) - starts[dest_sorted]
        send = jnp.full((m, B, W), SENTINEL, dtype=local.dtype)
        send = send.at[dest_sorted, slot].set(rows_sorted)
        recv = lax.all_to_all(send, "shard", split_axis=0, concat_axis=0,
                              tiled=False)
        mine = recv.reshape(m * B, W)
        cols = tuple(mine[:, w] for w in range(W))
        s = jnp.stack(lax.sort(cols, num_keys=W), axis=1)
        prev = jnp.concatenate(
            [jnp.full((1, W), SENTINEL, s.dtype), s[:-1]], axis=0)
        new = jnp.any(s != prev, axis=1)
        new = new.at[0].set(True)
        return s, new

    fn = jax.jit(_step)
    _SORT_FN_CACHE[key] = fn
    return fn


def sharded_sort_unique(keys: np.ndarray, mesh: Mesh | None = None,
                        n_devices: int | None = None) -> np.ndarray:
    """Globally sorted unique packed rows via the mesh-sharded pipeline."""
    if mesh is None:
        devs = jax.devices()[: n_devices or len(jax.devices())]
        mesh = Mesh(np.array(devs), ("shard",))
    m = mesh.shape["shard"]
    N, W = keys.shape
    B = max(-(-N // m), 1)
    pad = m * B - N
    if pad:
        keys = np.concatenate(
            [keys, np.full((pad, W), SENTINEL, dtype=keys.dtype)])
    boundaries = sample_boundaries(keys[:N], m)
    if m == 1:
        boundaries = np.zeros((0, W), dtype=keys.dtype)
    keys_d = jax.device_put(keys, NamedSharding(mesh, P("shard", None)))
    b_d = jax.device_put(
        np.ascontiguousarray(boundaries.reshape(max(m - 1, 1), W)
                             if m > 1 else np.zeros((1, W), keys.dtype)),
        NamedSharding(mesh, P(None, None)))
    fn = sharded_sort_unique_fn(mesh, m, B, W)
    s, new = fn(keys_d, b_d)
    s = np.asarray(s)
    new = np.asarray(new)
    # shard outputs are disjoint sorted ranges; concatenation is sorted.
    # adjacent-duplicate masks are per-shard: a shard-leading row duplicating
    # the previous shard's last row is impossible (same key -> same shard)
    keep = new & ~np.all(s == SENTINEL, axis=1)
    return s[keep]


def sharded_build_kmers(sequences, k: int, mesh: Mesh | None = None,
                        mode: str = "basic", n_devices: int | None = None):
    """Sharded construction front half: extract windows, mesh-sort, return
    the sorted unique (N, K) code matrix (feeds build_boss_arrays; the BOSS
    arrays then equal the single-device build's)."""
    from ..kmer import packing
    from ..kmer.extractor import KmerExtractor
    ex = KmerExtractor()
    packed, _ = ex._packed_windows(list(sequences), k, mode)
    # split uint64 words into uint32 pairs for the device exchange
    W64 = packed.shape[1]
    keys32 = np.empty((len(packed), W64 * 2), dtype=np.uint32)
    keys32[:, 0::2] = (packed >> np.uint64(32)).astype(np.uint32)
    keys32[:, 1::2] = (packed & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    uniq32 = sharded_sort_unique(keys32, mesh=mesh, n_devices=n_devices)
    uniq = (uniq32[:, 0::2].astype(np.uint64) << np.uint64(32)) \
        | uniq32[:, 1::2].astype(np.uint64)
    return packing.unpack_codes(uniq, k, packing.boss_priority_order(k))
