"""Device mesh + sharding helpers.

The reference's only parallelism is PyTorch DDP over NCCL
(tools/train.py:98-101, det3d/torchie/apis/train.py:284-291). The TPU-native
equivalent is a single ``jax.sharding.Mesh`` over ICI with:

- ``data`` axis: batch (and AL-pool frame) sharding — DDP equivalent; gradient
  psum inserted automatically by jit on the replicated-param / sharded-batch
  program. Masked batch-norm statistics become cross-replica sums the same
  way (SyncBN for free, replacing det3d/ops/syncbn).
- ``model`` axis: spatial partitioning of the dense BEV pipeline (H dim of
  the [B, H, W, C] map) — XLA SPMD handles conv halo exchange. This is the
  sequence/spatial-parallel dimension for this workload; the detector has no
  experts or deep stage pipeline, so EP/PP don't apply (SURVEY.md §2.6).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} > {n} devices"
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with the leading axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def bev_constraint(x, mesh: Mesh):
    """Constrain a dense BEV map [B, H, W, C] to (data, model) sharding."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data", "model")))
