"""metagraph_tpu — a TPU-native framework for building, annotating, querying and
aligning against succinct annotated de Bruijn graphs.

Re-designed from scratch for TPU hardware (JAX/XLA/Pallas) with the same
capabilities as the reference C++ engine (ratschlab/metagraph):

  * k-mer extraction / canonicalization   (ref: src/kmer/)
  * succinct BOSS de Bruijn graphs        (ref: src/graph/representation/succinct/)
  * hash / bitmap graph representations   (ref: src/graph/representation/{hash,bitmap}/)
  * multi-label annotation matrices       (ref: src/annotation/)
  * batched sequence queries              (ref: src/cli/query.cpp)
  * sequence-to-graph alignment           (ref: src/graph/alignment/)
  * CLI + HTTP server + Python client     (ref: src/cli/, api/python/)

Design principles (TPU-first, not a port):
  * k-mers are dense (N, W) arrays of nibble-packed codes; all hot operations are
    batched gathers / sorts / scans that XLA tiles onto the VPU/MXU.
  * graph navigation is fixed-depth vectorized loops (lax.fori_loop) over
    rank/select gathers, never per-element pointer chasing.
  * scale-out is a jax.sharding Mesh: k-mer-range sharding (the analog of the
    reference's suffix partitioning) + data-parallel query batches.
"""

__version__ = "0.1.0"
