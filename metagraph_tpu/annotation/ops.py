"""Device (TPU) annotation operations.

The annotation lives on device as a packed bitmap (num_rows, ceil(L/32))
uint32.  The hot query op — per-sequence label occurrence counts — is one
row-gather + bit-expand + segment-sum, all MXU/VPU-friendly:

    rows  = nodes - 1                       (0 = miss -> masked)
    bits  = expand(bitmap[rows])            (Q, L) 0/1
    count = segment_sum(bits, seq_ids)      (S, L)

This replaces the reference's per-sequence VectorMap + matrix sum_rows path
(ref annotated_dbg.cpp:246-280, binary_matrix sum_rows) with one batched
device computation for the whole query batch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp


def pack_annotation_bitmap(anno, num_rows: int | None = None) -> np.ndarray:
    """ColumnMajorAnnotation -> (num_rows, ceil(L/32)) uint32 bitmap."""
    anno.freeze()
    R = num_rows or anno.num_rows
    L = anno.num_labels
    Lw = max((L + 31) // 32, 1)
    bitmap = np.zeros((R, Lw), dtype=np.uint32)
    for c in range(L):
        rows = anno.column_rows(c)
        bitmap[rows, c // 32] |= np.uint32(1 << (c % 32))
    return bitmap


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceAnnotation:
    bitmap: jnp.ndarray      # (R, Lw) uint32
    num_labels: int

    def tree_flatten(self):
        return (self.bitmap,), (self.num_labels,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @classmethod
    def from_column_annotation(cls, anno, num_rows=None) -> "DeviceAnnotation":
        return cls(jnp.asarray(pack_annotation_bitmap(anno, num_rows)),
                   anno.num_labels)


@functools.partial(jax.jit, static_argnums=(3, 4))
def count_labels_sorted(bitmap: jnp.ndarray, nodes: jnp.ndarray,
                        seq_ids: jnp.ndarray, num_seqs: int, num_labels: int):
    """count_labels for SORTED seq_ids (contiguous runs — the natural batch
    layout): prefix-sum + boundary gather instead of scatter-add, which is
    far faster on TPU (no serialized scatters)."""
    hit = nodes > 0
    rows = jnp.where(hit, nodes - 1, 0)
    words = bitmap[rows]                                  # (Q, Lw)
    Lw = words.shape[1]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((words[:, :, None] >> shifts[None, None, :]) & 1).astype(jnp.int32)
    bits = bits.reshape(words.shape[0], Lw * 32)[:, :num_labels]
    bits = bits * hit[:, None].astype(jnp.int32)
    ps = jnp.cumsum(bits, axis=0)                         # (Q, L)
    ph = jnp.cumsum(hit.astype(jnp.int32))
    # last row index per sequence id (searchsorted right - 1; -1 -> zeros row)
    ends = jnp.searchsorted(seq_ids, jnp.arange(num_seqs, dtype=seq_ids.dtype),
                            side="right") - 1
    zrow = jnp.zeros((1, ps.shape[1]), ps.dtype)
    ps_ext = jnp.concatenate([zrow, ps], axis=0)
    ph_ext = jnp.concatenate([jnp.zeros(1, ph.dtype), ph])
    at = ps_ext[ends + 1]
    at_h = ph_ext[ends + 1]
    prev = jnp.concatenate([zrow, at[:-1]], axis=0)
    prev_h = jnp.concatenate([jnp.zeros(1, ph.dtype), at_h[:-1]])
    return at - prev, at_h - prev_h


@functools.partial(jax.jit, static_argnums=(3, 4))
def count_labels_matmul(bitmap: jnp.ndarray, nodes: jnp.ndarray,
                        seq_ids: jnp.ndarray, num_seqs: int, num_labels: int):
    """count_labels via one-hot matmul — runs on the MXU, ~2x faster than
    scatter-add on TPU.  Exact: 0/1 bf16 operands accumulate in f32
    (counts < 2^24).  Returns float32 (cast by the caller)."""
    hit = nodes > 0
    rows = jnp.where(hit, nodes - 1, 0)
    words = bitmap[rows]
    Lw = words.shape[1]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((words[:, :, None] >> shifts[None, None, :]) & 1)
    bits = bits.reshape(words.shape[0], Lw * 32)[:, :num_labels]
    bits = bits.astype(jnp.bfloat16) * hit[:, None].astype(jnp.bfloat16)
    onehot = (seq_ids[:, None]
              == jnp.arange(num_seqs, dtype=seq_ids.dtype)[None, :]
              ).astype(jnp.bfloat16)
    counts = jax.lax.dot_general(onehot, bits, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    present = jnp.sum(onehot * hit[:, None].astype(jnp.bfloat16), axis=0,
                      dtype=jnp.float32)
    return counts, present


@functools.partial(jax.jit, static_argnums=(3, 4))
def count_labels(bitmap: jnp.ndarray, nodes: jnp.ndarray,
                 seq_ids: jnp.ndarray, num_seqs: int, num_labels: int):
    """Per-sequence per-label occurrence counts + presence counts.

    nodes: (Q,) int32 node ids per k-mer window (0 = miss)
    seq_ids: (Q,) int32 sequence index per window
    -> counts (num_seqs, num_labels) int32, present (num_seqs,) int32
    """
    hit = nodes > 0
    rows = jnp.where(hit, nodes - 1, 0)
    words = bitmap[rows]                                  # (Q, Lw)
    Lw = words.shape[1]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((words[:, :, None] >> shifts[None, None, :]) & 1).astype(jnp.int32)
    bits = bits.reshape(words.shape[0], Lw * 32)[:, :num_labels]
    bits = bits * hit[:, None].astype(jnp.int32)
    counts = jax.ops.segment_sum(bits, seq_ids, num_segments=num_seqs)
    present = jax.ops.segment_sum(hit.astype(jnp.int32), seq_ids,
                                  num_segments=num_seqs)
    return counts, present
