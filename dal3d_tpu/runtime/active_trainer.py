"""Dual-model trainer for the partial-label AL pipeline.

Re-design of det3d/torchie/trainer/active_trainer.py:126-720 +
torchie/apis/active_train.py:252: trains the detector and a box-quality
``Estimator`` side by side with separate optimizers/checkpoints — the
estimator learns to predict each detection's 3D IoU against the (partial)
labels, and its scores drive the partial-label selectors. Both steps are
jitted; the estimator consumes the detector's decoded predictions
(stop-gradient) plus raw points.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.heads.mg_head import multi_group_predict
from ..ops.rotated_iou_fast import boxes_iou3d_fast as boxes_iou3d
from .steps import TrainState, create_train_state, make_train_step
from .trainer import Trainer


class EstimatorState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_estimator_step(bundle, estimator, optimizer, num_boxes: int = 64):
    """Jitted estimator training step: detector predictions (frozen) ->
    pooled box points -> IoU regression vs. labels
    (reference estimator_batch_processor_inline, active_trainer.py:410)."""

    def step(est_state: EstimatorState, det_state: TrainState, batch: Dict[str, Any]):
        preds = multi_group_predict(
            bundle.model.apply(
                {"params": det_state.params, "batch_stats": det_state.batch_stats},
                batch["points"], batch["points_valid"], False,
            )["preds"],
            bundle.task_anchors, bundle.box_coder, bundle.test_cfg,
        )
        boxes = jax.lax.stop_gradient(preds["box3d_lidar"][:, :num_boxes])
        det_valid = preds["det_valid"][:, :num_boxes]

        # IoU targets vs all GT boxes (concatenated across tasks)
        gt_all = jnp.concatenate(batch["gt_boxes"], axis=1)  # [B, G*, 9]
        gt_valid = jnp.concatenate(
            [c > 0 for c in batch["gt_classes"]], axis=1
        )

        def tgt(dec, gts, gv):
            iou = boxes_iou3d(dec, gts)
            iou = jnp.where(gv[None, :], iou, 0.0)
            return iou.max(axis=1)

        target = jax.vmap(tgt)(boxes, gt_all, gt_valid)

        def loss_fn(params):
            pred_iou = estimator.apply({"params": params}, batch["points"],
                                       batch["points_valid"], boxes)
            w = det_valid.astype(jnp.float32)
            loss = (jnp.square(pred_iou - target) * w).sum() / jnp.maximum(w.sum(), 1.0)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(est_state.params)
        updates, opt_state = optimizer.update(grads, est_state.opt_state, est_state.params)
        params = optax.apply_updates(est_state.params, updates)
        return (
            EstimatorState(step=est_state.step + 1, params=params, opt_state=opt_state),
            {"estimator_loss": loss},
        )

    return jax.jit(step)


class ActiveTrainer(Trainer):
    """Trainer + estimator co-training (reference ActiveTrainer:126)."""

    def __init__(self, bundle, optimizer, estimator, estimator_optimizer, work_dir, **kw):
        super().__init__(bundle, optimizer, work_dir, **kw)
        self.estimator = estimator
        self.estimator_optimizer = estimator_optimizer
        self.estimator_step = make_estimator_step(bundle, estimator, estimator_optimizer)
        self.est_state: Optional[EstimatorState] = None

    def init_estimator(self, rng, sample_batch, num_boxes: int = 64):
        B = sample_batch["points"].shape[0]
        boxes = jnp.zeros((B, num_boxes, 9)).at[..., 3:6].set(1.0)
        variables = jax.jit(self.estimator.init)(
            rng, sample_batch["points"], sample_batch["points_valid"], boxes
        )
        self.est_state = EstimatorState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            opt_state=self.estimator_optimizer.init(variables["params"]),
        )
        return self.est_state

    def train_epoch(self, loader):
        stats = None
        for batch in loader:
            b = {k: v for k, v in batch.items() if k != "metadata"}
            if self.mesh is not None:
                # mirror Trainer.train_epoch: shard the batch over 'data' and
                # set the ambient mesh so bev_constraint sees the model axis
                from ..parallel.mesh import shard_batch

                b = shard_batch(b, self.mesh)
                with jax.set_mesh(self.mesh):
                    self.state, logs = self.train_step(self.state, b)
                    self.est_state, est_logs = self.estimator_step(
                        self.est_state, self.state, b)
            else:
                self.state, logs = self.train_step(self.state, b)
                self.est_state, est_logs = self.estimator_step(
                    self.est_state, self.state, b)
            stats = {**{k: float(v) for k, v in logs.items()},
                     "estimator_loss": float(est_logs["estimator_loss"])}
        self.epoch += 1
        if stats:
            self.logger.info(
                f"[active] epoch {self.epoch}: loss {stats['loss']:.4f}, "
                f"estimator_loss {stats['estimator_loss']:.4f}"
            )
        return stats or {}
