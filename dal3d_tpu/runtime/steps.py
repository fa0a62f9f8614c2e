"""Jitted train / eval / scoring steps.

The reference's Trainer.batch_processor_inline (det3d/torchie/trainer/
trainer.py:347) moves CPU-assembled batches to GPU and runs forward+loss;
here the entire step — voxelize, backbone, target assignment, loss, optimizer
update — is ONE jitted XLA program over the device mesh. Batches arrive as
fixed-shape padded host arrays.

Batch dict contract (all leading dim B, shardable over 'data'):
  points        [B, P, F] float32 (padded)
  points_valid  [B, P]    bool
  gt_boxes      list per task of [B, G, 9]
  gt_classes    list per task of [B, G] int32 (task-local 1-based, 0 = pad)
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.heads.mg_head import multi_group_loss, multi_group_predict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(bundle, optimizer, rng, sample_batch) -> TrainState:
    # jit the init: eager per-op dispatch of the full network is pathological
    # on remote-compile TPU backends
    variables = jax.jit(bundle.model.init, static_argnums=(3,))(
        rng, sample_batch["points"], sample_batch["points_valid"], False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )


def make_train_step(bundle, optimizer) -> Callable:
    model, assigner = bundle.model, bundle.assigner
    num_classes, loss_cfg = bundle.num_classes, bundle.loss_cfg

    def train_step(state: TrainState, batch: Dict[str, Any]):
        voxels = (
            (batch["voxel_features"], batch["voxel_coords"], batch["voxel_valid"])
            if "voxel_features" in batch else None
        )
        if voxels is not None and "brick_row" in batch:
            # host sparse-plan pyramid (data/sparse_plans.py via the loader)
            from ..ops.sparse_brick import host_plan_batch_keys

            voxels = voxels + (
                {k: batch[k] for k in host_plan_batch_keys(batch)},)

        def loss_fn(params):
            out, new_model_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"], batch["points_valid"], True,
                voxels=voxels,
                mutable=["batch_stats"],
            )
            labels, targets, _ = assigner.assign_all(batch["gt_boxes"], batch["gt_classes"])
            logs = multi_group_loss(out["preds"], labels, targets, num_classes, loss_cfg)
            return logs["loss"], (logs, new_model_state)

        (loss, (logs, new_model_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_model_state["batch_stats"],
            opt_state=new_opt_state,
        )
        scalar_logs = {
            "loss": logs["loss"],
            "grad_norm": optax.global_norm(grads),
            "num_pos": sum(logs["num_pos"]),
            "loc_loss": sum(logs["loc_loss"]),
            "cls_loss": sum(logs["cls_loss"]),
        }
        return new_state, scalar_logs

    return jax.jit(train_step, donate_argnums=(0,))


def make_predict_step(bundle) -> Callable:
    """Detection forward: points -> padded per-frame detections + embedding.

    Serves both eval (dist_test) and AL pool scoring: the returned dict is the
    reference's ``estimate=True`` contract (SURVEY.md A.9) in fixed shapes —
    detections plus the pooled [B, 512] neck embedding every feature-based
    selector consumes.
    """
    model = bundle.model
    task_anchors, box_coder, test_cfg = bundle.task_anchors, bundle.box_coder, bundle.test_cfg

    def predict_step(params, batch_stats, batch):
        voxels = (
            (batch["voxel_features"], batch["voxel_coords"], batch["voxel_valid"])
            if "voxel_features" in batch else None
        )
        if voxels is not None and "brick_row" in batch:
            # host sparse-plan pyramid (data/sparse_plans.py via the loader)
            from ..ops.sparse_brick import host_plan_batch_keys

            voxels = voxels + (
                {k: batch[k] for k in host_plan_batch_keys(batch)},)
        if voxels is not None and "points" not in batch:
            # host-voxelized feed: the raw point cloud is not needed (and at
            # 250k pts x 5 x f32 it would dominate the H2D payload)
            B = voxels[0].shape[0]
            points = jnp.zeros((B, 1, model.num_input_features), jnp.float32)
            points_valid = jnp.zeros((B, 1), bool)
        else:
            points, points_valid = batch["points"], batch["points_valid"]
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            points, points_valid, False,
            voxels=voxels,
        )
        dets = multi_group_predict(out["preds"], task_anchors, box_coder, test_cfg)
        dets["embedding"] = out["embedding"]
        # per-frame mean binary entropy of detection scores (entropy selectors)
        s = jnp.clip(dets["scores"], 1e-6, 1 - 1e-6)
        ent = -(s * jnp.log(s) + (1 - s) * jnp.log(1 - s))
        valid = dets["det_valid"]
        dets["score_entropy"] = (ent * valid).sum(-1) / jnp.maximum(valid.sum(-1), 1)
        return dets

    return jax.jit(predict_step)
