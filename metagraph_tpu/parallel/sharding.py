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
