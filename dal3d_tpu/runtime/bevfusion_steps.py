"""Jitted train/predict steps for the BEVFusion track.

Counterpart of runtime.steps for the fusion model (reference training flow:
bevfusion/tools/train.py + mmdet3d/apis/train.py:19): one XLA program per
step — lidar voxelize + SparseEncoder, optional camera branch, fuser, SECOND
decoder, TransFusion head with Hungarian-matched losses.

Batch contract (leading dim B):
  points [B, P, F], points_valid [B, P]
  gt_boxes [B, G, 9] (lidar frame), gt_classes [B, G] global 1-based (0 pad)
  camera (optional): images [B, N, iH, iW, 3], depth_images [B, N, iH, iW, 1],
  camera2lidar_rots/trans, camera_intrinsics, img_aug_rots/trans
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..models.bevfusion.transfusion import (
    TransFusionTestCfg, transfusion_decode, transfusion_loss,
)
from .steps import TrainState

CAMERA_KEYS = (
    "images", "depth_images", "camera2lidar_rots", "camera2lidar_trans",
    "camera_intrinsics", "img_aug_rots", "img_aug_trans",
)


def create_bevfusion_state(model, optimizer, rng, sample_batch) -> TrainState:
    variables = jax.jit(model.init, static_argnums=(2,))(rng, sample_batch, False)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
    )


def make_bevfusion_train_step(model, optimizer, test_cfg: TransFusionTestCfg,
                              seg_loss_weight: float = 1.0) -> Callable:
    def train_step(state: TrainState, batch: Dict[str, Any]):
        model_batch = {k: v for k, v in batch.items()
                       if k not in ("gt_boxes", "gt_classes", "gt_masks_bev")}
        # per-step dropout rng for Swin stochastic depth (drop_path 0.2)
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)

        def loss_fn(params):
            preds, new_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                model_batch, True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            logs = transfusion_loss(preds, batch["gt_boxes"], batch["gt_classes"], test_cfg)
            if "gt_masks_bev" in batch and "seg_logits" in preds:
                from ..models.bevfusion.segm import bev_segmentation_loss

                logits = preds["seg_logits"]
                tgt = batch["gt_masks_bev"]
                if logits.shape[1:3] != tgt.shape[1:3]:
                    logits = jax.image.resize(
                        logits, (logits.shape[0], *tgt.shape[1:3], logits.shape[-1]),
                        method="bilinear",
                    )
                seg = bev_segmentation_loss(logits, tgt)
                logs = dict(logs)
                logs["seg_loss"] = seg["loss"]
                logs["loss"] = logs["loss"] + seg_loss_weight * seg["loss"]
            else:
                logs = dict(logs)
                logs["seg_loss"] = jnp.zeros(())
            return logs["loss"], (logs, new_state)

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
        return new_state, {
            "loss": logs["loss"],
            "cls_loss": logs["cls_loss"],
            "reg_loss": logs["reg_loss"],
            "heatmap_loss": logs["heatmap_loss"],
            "seg_loss": logs["seg_loss"],
            "num_matched": logs["num_matched"],
            "grad_norm": optax.global_norm(grads),
        }

    return jax.jit(train_step, donate_argnums=(0,))


def make_bevfusion_predict_step(model, test_cfg: TransFusionTestCfg) -> Callable:
    def predict_step(params, batch_stats, batch):
        preds = model.apply({"params": params, "batch_stats": batch_stats}, batch, False)
        return transfusion_decode(preds, test_cfg)

    return jax.jit(predict_step)
