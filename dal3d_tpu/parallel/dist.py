"""Multi-process (multi-host) utilities.

Replaces the reference's torch.distributed helpers (det3d/torchie/trainer/
utils.py:22-120, det3d/utils/dist/dist_common.py:48-88): rank == jax process
index; object all-gather goes through jax's multihost utils when running
multi-process, degrading to single-process passthrough otherwise.
"""
from __future__ import annotations

import functools
from typing import Any, List

import jax


def get_dist_info():
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def master_only(func):
    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        rank, _ = get_dist_info()
        if rank == 0:
            return func(*args, **kwargs)

    return wrapper


def synchronize():
    _, world = get_dist_info()
    if world == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dal3d_sync")


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather arbitrary picklable objects from every process (reference
    dist_common.py:48 pickle-based all_gather)."""
    _, world = get_dist_info()
    if world == 1:
        return [obj]
    from jax.experimental import multihost_utils
    import pickle
    import numpy as np

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to max size across processes
    size = np.array([payload.size], np.int64)
    all_sizes = multihost_utils.process_allgather(size).reshape(-1)
    maxl = int(all_sizes.max())
    padded = np.zeros(maxl, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, : int(all_sizes[i])].tobytes()) for i in range(world)]
