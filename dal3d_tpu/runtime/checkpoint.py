"""Checkpoint save/load/resume (orbax).

Replaces det3d/torchie/trainer/checkpoint.py:121-215: a checkpoint holds
{meta: {epoch, global_step, version, class_names}, state: TrainState pytree}.
Epoch-interval saving + latest-symlink semantics match the reference's
CheckpointHook (hooks/checkpoint.py:5) + Trainer.resume (trainer.py:511).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .. import __version__


def _mngr(work_dir: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(os.path.join(work_dir, "checkpoints")),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(work_dir: str, state, epoch: int, meta: Optional[dict] = None, max_to_keep=None):
    mngr = _mngr(work_dir, max_to_keep)
    mngr.save(epoch, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()
    m = {"epoch": epoch, "global_step": int(state.step), "dal3d_version": __version__}
    if meta:
        m.update(meta)
    if jax.process_index() == 0:
        with open(os.path.join(work_dir, "checkpoints", f"meta_{epoch}.json"), "w") as f:
            json.dump(m, f)
    mngr.close()


def latest_epoch(work_dir: str) -> Optional[int]:
    d = os.path.join(work_dir, "checkpoints")
    if not os.path.isdir(d):
        return None
    steps = [int(x) for x in os.listdir(d) if x.isdigit()]
    return max(steps) if steps else None


def load_checkpoint(work_dir: str, state_template, epoch: Optional[int] = None):
    """Restore a TrainState (or any pytree) saved by save_checkpoint.

    Returns (state, meta) — meta {} if missing.
    """
    if epoch is None:
        epoch = latest_epoch(work_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {work_dir}")
    mngr = _mngr(work_dir)
    state = mngr.restore(epoch, args=ocp.args.StandardRestore(state_template))
    mngr.close()
    meta_path = os.path.join(work_dir, "checkpoints", f"meta_{epoch}.json")
    meta: dict = {}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta.setdefault("epoch", epoch)
    return state, meta


def load_partial_params(work_dir: str, state, epoch: Optional[int] = None,
                        logger=None):
    """Warm-start across MODEL STRUCTURES: restore a checkpoint saved from a
    different module tree and copy every params/batch_stats leaf whose path
    and shape match into ``state`` (the reference's strict=False
    load_checkpoint, torchie/trainer/checkpoint.py:121-190 — used for the
    BEVFusion stage-1 lidar -> stage-2 fusion transfer).

    Optimizer state is NOT transferred (new optimizer, step 0 semantics).
    Returns (state, n_copied, n_skipped)."""
    if epoch is None:
        epoch = latest_epoch(work_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {work_dir}")
    mngr = _mngr(work_dir)
    raw = mngr.restore(epoch, args=ocp.args.StandardRestore())  # template-free
    mngr.close()

    import numpy as np

    def flat(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flat(v, prefix + k + "/"))
            else:
                out[prefix + k] = v
        return out

    def unflat(d):
        tree: dict = {}
        for k, v in d.items():
            node = tree
            parts = k.split("/")
            for q in parts[:-1]:
                node = node.setdefault(q, {})
            node[parts[-1]] = v
        return tree

    copied = skipped = 0
    new = {}
    for what in ("params", "batch_stats"):
        src = flat(raw.get(what, {}) or {})
        dst = flat(getattr(state, what) or {})
        for k in dst:
            if k in src and tuple(np.shape(src[k])) == tuple(np.shape(dst[k])):
                dst[k] = jax.numpy.asarray(src[k], np.asarray(dst[k]).dtype)
                copied += 1
            else:
                skipped += 1
        new[what] = unflat(dst)
    if logger is not None:
        logger.info(f"partial warm-start from {work_dir} (epoch {epoch}): "
                    f"{copied} leaves copied, {skipped} kept init")
    return state.replace(params=new["params"], batch_stats=new["batch_stats"]), copied, skipped
