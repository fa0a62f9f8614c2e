"""Brick-capacity observability (ADVICE r2).

The brick engines (`ops/sparse_brick.py`, impl="brick"/"banded") compact
active bricks into static per-level capacities; overflow silently drops the
highest-(y,x,z) bricks, degrading numerics with no error. This module makes
that observable: a one-shot report comparing each level's ACTIVE brick count
against its capacity, logged by the Trainer on the first batch of a run.

- Level 0 reports the TRUE (uncapped) demand via
  `sparse_brick.count_active_bricks` — it can exceed the cap.
- Levels 1..4 report the post-compaction count from the model's `middle`
  pyramid; a count EQUAL to the cap means at-or-over capacity (the compacted
  list cannot express overflow), flagged as saturated.

No reference counterpart: spconv tensors are dynamically sized, so the
reference cannot truncate (`bevfusion/mmdet3d/ops/spconv/ops.py`); fixed
TPU shapes trade that for this report.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp


def _counts_fn(model, params, batch_stats, vf, vc, vv):
    """Jittable: per-level (active [B]) brick counts for the current batch."""
    from ..ops.sparse_brick import BrickBatch, count_active_bricks

    D, H, W = (int(s) for s in model.voxel_cfg.sparse_shape)
    bw0 = min(int(model.brick_widths[0]), W)
    counts = [count_active_bricks(vc, vv, (D, H, W), bw0)]
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.zeros((vf.shape[0], 1, model.num_input_features), jnp.float32),
        jnp.zeros((vf.shape[0], 1), bool),
        False,
        voxels=(vf, vc, vv),
    )
    for mb in out.get("middle", []):
        if isinstance(mb, BrickBatch):
            counts.append((mb.brick_lin < mb.num_cells).sum(-1))
    return counts


def brick_capacity_report(bundle, params, batch_stats,
                          batch: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Per-level capacity rows for one (host-voxelized) batch, or [] when the
    backbone is not a brick engine / the batch carries no voxel tensors.

    Row: {"level", "active" (max over batch), "cap", "saturated"} —
    saturated means truncation happened (L0) or the compacted list is full
    (L1+, at-or-over capacity).
    """
    model = bundle.model
    if getattr(model, "backbone_impl", None) not in ("brick", "banded"):
        return []
    if "voxel_features" not in batch:
        return []
    caps = [int(c) for c in (model.banded_caps
                             if model.backbone_impl == "banded"
                             else model.brick_caps)]
    counts = jax.jit(functools.partial(_counts_fn, model))(
        params, batch_stats,
        batch["voxel_features"], batch["voxel_coords"], batch["voxel_valid"],
    )
    rows = []
    for lvl, c in enumerate(counts):
        active = int(jnp.max(c))
        cap = caps[lvl] if lvl < len(caps) else -1
        rows.append({
            "level": lvl,
            "active": active,
            "cap": cap,
            # L0 count is the true demand (> cap possible); L1+ counts come
            # from the capped list, where == cap already means saturation
            "saturated": active > cap if lvl == 0 else active >= cap,
        })
    return rows


def log_capacity_report(trainer, batch) -> None:
    """One-shot trainer hook: log the report, WARN on any saturated level.
    Never raises — observability must not take down a training run."""
    try:
        rows = brick_capacity_report(
            trainer.bundle, trainer.state.params, trainer.state.batch_stats,
            batch)
    except Exception as e:  # pragma: no cover - defensive
        trainer.logger.warning(f"brick capacity report failed: {e}")
        return
    if not rows:
        return
    parts = [f"L{r['level']}: {r['active']}/{r['cap']}"
             + (" SATURATED" if r["saturated"] else "") for r in rows]
    msg = "brick capacities (active/cap, first batch): " + ", ".join(parts)
    if any(r["saturated"] for r in rows):
        trainer.logger.warning(
            msg + " — saturated levels TRUNCATE bricks (numerics degrade "
            "silently); raise brick_caps/banded_caps in the model config")
    else:
        trainer.logger.info(msg)
