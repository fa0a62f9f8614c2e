"""MultiGroupLossHead — CBGS head variant with per-anchor IoU prediction.

Re-design of det3d/models/bbox_heads/mg_loss_head.py:176 (and the closely
related mg_iou_head.py) used by the partial-label / IoU-estimation
experiments: each task head adds a ``conv_iou`` branch predicting the 3D IoU
between the decoded box and its matched GT; the IoU target is computed with
the native ``boxes_iou3d`` (replacing the boxes_iou3d_gpu CUDA kernel) and
supervised with smooth-L1 on positives.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.box_coders import GroundBox3dCoder
from ...ops.rotated_iou_fast import boxes_iou3d_fast as boxes_iou3d
from ..layers import kaiming_conv_init
from ..losses.losses import prepare_loss_weights, weighted_smooth_l1
from ..registry import HEADS
from .mg_head import LossConfig, MultiGroupHead, multi_group_loss


@HEADS.register_module
class MultiGroupLossHead(nn.Module):
    num_classes: Sequence[int]
    code_size: int = 10
    num_rot: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[Dict[str, jnp.ndarray]]:
        preds = MultiGroupHead(
            num_classes=tuple(self.num_classes), code_size=self.code_size,
            num_rot=self.num_rot,
        )(x)
        for t, nc in enumerate(self.num_classes):
            num_a = nc * self.num_rot
            preds[t]["iou_preds"] = nn.Conv(
                num_a, (1, 1), kernel_init=kaiming_conv_init()
            )(x)
        return preds


def multi_group_loss_with_iou(
    preds: List[Dict[str, jnp.ndarray]],
    labels: List[jnp.ndarray],
    reg_targets: List[jnp.ndarray],
    task_anchors,
    box_coder: GroundBox3dCoder,
    gt_boxes_by_task: List[jnp.ndarray],  # per task [B, G, 9]
    num_classes: Sequence[int],
    cfg: LossConfig = LossConfig(),
    iou_loss_weight: float = 1.0,
):
    """Base multi-group loss + per-task IoU regression on positives."""
    logs = multi_group_loss(preds, labels, reg_targets, num_classes, cfg)
    iou_total = 0.0
    for t, pred in enumerate(preds):
        B = pred["box_preds"].shape[0]
        code = box_coder.code_size
        box_preds = pred["box_preds"].reshape(B, -1, code)
        anchors = jnp.asarray(task_anchors[t].anchors)
        decoded = box_coder.decode_jax(box_preds, anchors[None])  # [B, A, 9]
        iou_preds = pred["iou_preds"].reshape(B, -1)

        def per_sample(dec, gts, lab):
            iou = boxes_iou3d(dec, gts)  # [A, G]
            return iou.max(axis=1)

        target_iou = jax.vmap(per_sample)(decoded, gt_boxes_by_task[t], labels[t])
        _, reg_weights, _ = prepare_loss_weights(labels[t], cfg.pos_cls_weight, cfg.neg_cls_weight)
        iou_loss = weighted_smooth_l1(
            iou_preds[..., None], jax.lax.stop_gradient(target_iou)[..., None], reg_weights
        ).sum() / B
        iou_total = iou_total + iou_loss
    logs["iou_loss"] = iou_total
    logs["loss"] = logs["loss"] + iou_loss_weight * iou_total
    return logs
