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
