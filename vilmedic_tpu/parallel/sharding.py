"""Parameter sharding rules: data-parallel by default, optional tensor parallel.

The reference is data-parallel only (SURVEY.md §2.3); SPMD makes a ``model`` mesh
axis free: transformer kernels are sharded Megatron-style —
- attention q/k/v and FFN fc1 kernels column-sharded ``P(None, 'model')``
  (head/neuron split, no communication on the forward matmul),
- attention output and FFN fc2 kernels row-sharded ``P('model', None)``
  (XLA inserts the all-reduce over ICI),
- embeddings, layernorms, biases, and conv towers replicated.

Applying the rules is just ``jax.device_put`` with ``NamedSharding``; the jitted
step then runs dp x tp with XLA-emitted collectives.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

COLUMN_KERNELS = ("q", "k", "v", "fc1")
ROW_KERNELS = ("o", "fc2")


def _spec_for(path, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    if "kernel" in names and leaf.ndim == 2:
        parent = names[-2] if len(names) >= 2 else None
        if parent in COLUMN_KERNELS:
            return P(None, MODEL_AXIS)
        if parent in ROW_KERNELS:
            return P(MODEL_AXIS, None)
        if parent == "lm_head":
            return P(None, MODEL_AXIS)  # vocab-sharded logits
    return P()  # replicate everything else


def shard_params(params: Any, mesh: Mesh):
    """Place a parameter pytree on the mesh according to the TP rules."""

    def put(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, _spec_for(path, leaf)))

    return jax.tree_util.tree_map_with_path(put, params)


def param_specs(params: Any):
    """The PartitionSpec tree (for in_shardings / debugging)."""
    return jax.tree_util.tree_map_with_path(lambda p, l: _spec_for(p, l), params)
