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


def bev_constraint(x, mesh: Optional[Mesh] = None):
    """Partition a dense BEV tensor over the mesh: batch on 'data', the H
    (row) axis on 'model' — XLA SPMD inserts the conv halo exchanges. Called
    from inside model code with no mesh argument: picks up the AMBIENT mesh
    (jax.set_mesh context installed by the trainer/dryrun); a no-op when
    there is no ambient mesh or its 'model' axis is trivial, so single-chip
    programs compile unchanged."""
    if mesh is not None:
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", "model"))
        )
    m = jax.sharding.get_abstract_mesh()
    if (m is None or m.empty or "model" not in m.axis_names
            or m.shape["model"] == 1 or x.ndim < 3):
        return x
    spec = P("data", "model", *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, spec)


def data_parallel_predict(predict, mesh: Optional[Mesh]):
    """Wrap a jitted (params, batch_stats, batch) predict step so pool
    scoring / eval shard frames over the mesh 'data' axis — the TPU
    equivalent of the reference's DDP-sharded pool pass
    (tools/active_select.py:124-130, tools/dist_test.py:131-160).

    Params/batch-stats are replicated once (memoized by object identity —
    the cache holds strong references to the key objects, so their ids
    cannot be recycled into a stale hit); every batch is placed
    batch-sharded, so jit compiles the step as SPMD over the mesh with no
    per-call resharding."""
    if mesh is None:
        return predict
    rep, bsh = replicate_sharding(mesh), batch_sharding(mesh)
    cache: dict = {}

    def wrapped(params, batch_stats, batch):
        if cache.get("p_obj") is not params or cache.get("bs_obj") is not batch_stats:
            cache["p_obj"], cache["bs_obj"] = params, batch_stats
            cache["params"] = jax.device_put(params, rep)
            cache["bs"] = jax.device_put(batch_stats, rep)
        batch = jax.tree_util.tree_map(lambda x: jax.device_put(x, bsh), batch)
        return predict(cache["params"], cache["bs"], batch)

    return wrapped


def sharded_eval_predict(bundle, logger=None, what: str = "eval"):
    """Mesh-sharded predict step for the eval/pool-scoring CLIs: builds the
    device mesh when >1 device is visible and wraps the bundle's jitted
    predict with data_parallel_predict (shared by tools/test.py,
    tools/dist_test.py and tools/active_select.py)."""
    import jax

    from ..runtime.steps import make_predict_step

    mesh = make_mesh() if jax.device_count() > 1 else None
    if mesh is not None and logger is not None:
        logger.info(f"{what} sharded over mesh {mesh.shape}")
    return data_parallel_predict(make_predict_step(bundle), mesh), mesh
