"""Device mesh + sharding utilities: the SPMD replacement for the reference's
DataParallel/Accelerate-NCCL stack (reference SURVEY.md §2.3).

- single-process multi-chip: one ``Mesh`` over all local devices, batch sharded on
  the ``data`` axis, parameters replicated (or sharded on ``model`` for TP);
- multi-host: ``jax.distributed.initialize`` over DCN, same jitted step — XLA
  emits the gradient all-reduces over ICI that Accelerate/NCCL did by hand
  (reference trainor_accelerate.py:132);
- eval gathering: ``process_allgather`` replaces ``gather_for_metrics``
  (reference validator_accelerate.py:155-162).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed() -> None:
    """Initialize multi-host JAX when launched under a cluster (no-op otherwise)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()


def get_mesh(model_parallel: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over all devices.

    ``model_parallel`` chips are grouped on the inner (fastest ICI) axis; the rest
    become data-parallel replicas.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh):
    """Place a host batch pytree onto the mesh, sharded on the leading axis.

    Single-process: a plain sharded device_put. Multi-process (the DDP
    equivalent, reference trainor_accelerate.py:91-93): each host's local
    batch is its SHARD of the global batch (the DataLoader slices
    ``batch[shard_index::num_shards]``), assembled into one global array with
    ``host_local_array_to_global_array`` so the single jitted step spans all
    hosts and XLA emits the gradient all-reduces over ICI/DCN.

    Non-array leaves (token lists, None) pass through untouched.
    """
    multi = jax.process_count() > 1
    if multi:
        from jax.experimental import multihost_utils

    def put(x):
        if x is None or not hasattr(x, "shape") or x.ndim == 0:
            return x
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        if multi:
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, spec
            )
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def process_allgather(tree):
    """Gather per-host values across processes (eval refs/hyps/losses)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def gather_string_lists(strings):
    """Gather ragged per-host string lists across processes, order-stable by
    process index (the SPMD replacement for ``gather_for_metrics`` on refs/hyps,
    reference validator_accelerate.py:155-176 — which pads/trims; here strings
    are encoded to fixed-shape padded uint8 token arrays, gathered, and decoded,
    so nothing is silently truncated)."""
    if jax.process_count() == 1:
        return list(strings)
    from jax.experimental import multihost_utils

    data = [s.encode("utf-8") for s in strings]
    dims = multihost_utils.process_allgather(
        np.array([len(data), max((len(b) for b in data), default=0)], np.int32)
    )  # (P, 2)
    max_n = int(dims[:, 0].max())
    max_len = max(int(dims[:, 1].max()), 1)

    arr = np.zeros((max_n, max_len), np.uint8)
    lens = np.zeros((max_n,), np.int32)
    for i, b in enumerate(data):
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    all_arr = multihost_utils.process_allgather(arr)  # (P, max_n, max_len)
    all_lens = multihost_utils.process_allgather(lens)  # (P, max_n)

    out = []
    for p in range(dims.shape[0]):
        for i in range(int(dims[p, 0])):
            out.append(bytes(all_arr[p, i, : int(all_lens[p, i])]).decode("utf-8"))
    return out


def broadcast_json(obj, root: int = 0):
    """Broadcast a JSON-serializable object from ``root`` to every process —
    used to sync rank-0 metric dicts so early-stop/checkpoint decisions agree
    on all hosts (the reference broadcasts via torch.distributed under
    Accelerate; here a length-prefixed uint8 broadcast)."""
    if jax.process_count() == 1:
        return obj
    import json

    from jax.experimental import multihost_utils

    payload = (
        np.frombuffer(json.dumps(obj, default=str).encode("utf-8"), np.uint8)
        if jax.process_index() == root else np.zeros((0,), np.uint8)
    )
    length = multihost_utils.broadcast_one_to_all(
        np.asarray(len(payload), np.int32), is_source=jax.process_index() == root
    )
    buf = np.zeros((int(length),), np.uint8)
    buf[: len(payload)] = payload
    out = multihost_utils.broadcast_one_to_all(
        buf, is_source=jax.process_index() == root
    )
    return json.loads(bytes(np.asarray(out)).decode("utf-8"))


def gather_arrays(x: np.ndarray) -> np.ndarray:
    """Gather per-host arrays of possibly different leading sizes across
    processes (classifier eval logits/labels), concatenated in process order."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    x = np.asarray(x)
    counts = multihost_utils.process_allgather(np.asarray([len(x)], np.int32))
    max_n = int(counts.max())
    padded = np.zeros((max_n, *x.shape[1:]), x.dtype)
    padded[: len(x)] = x
    gathered = multihost_utils.process_allgather(padded)  # (P, max_n, ...)
    return np.concatenate(
        [gathered[p, : int(counts[p, 0])] for p in range(gathered.shape[0])],
        axis=0,
    )


def gather_weighted_mean(value: float, weight: float) -> float:
    """Weighted cross-process mean (eval loss gathering, reference
    validator_accelerate.py:155-162 weighted loss tensors)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    vw = multihost_utils.process_allgather(
        np.array([float(value) * float(weight), float(weight)], np.float64)
    )  # (P, 2)
    total_w = float(vw[:, 1].sum())
    return float(vw[:, 0].sum() / total_w) if total_w else float(value)


def local_batch_size(global_batch_size: int, mesh: Optional[Mesh] = None) -> int:
    """Per-host share of the global batch."""
    return max(1, global_batch_size // jax.process_count())
