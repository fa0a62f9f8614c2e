"""Training losses as pure JAX functions.

Replaces the reference's CUDA fused focal loss (det3d/ops/sigmoid_focal_loss +
det3d/models/losses/losses.py:274-360) and WeightedSmoothL1Loss (:147-210)
with XLA-fused elementwise math — on TPU these fuse into the surrounding
head computation, no custom kernel needed.

Parity note: the reference *hard-disables* per-code weights
(losses.py:173 sets ``self._code_weights = None`` unconditionally even though
configs pass code_weights), so the default here matches that behavior;
``code_weights`` is applied only when ``use_code_weights=True``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def sigmoid_cross_entropy_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(
    logits: jnp.ndarray,  # [B, A, C]
    targets: jnp.ndarray,  # [B, A, C] one-hot
    weights: jnp.ndarray,  # [B, A]
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Per-element focal loss [B, A, C] (reference SigmoidFocalLoss.forward)."""
    ce = sigmoid_cross_entropy_with_logits(logits, targets)
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    modulating = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha) if alpha is not None else 1.0
    return modulating * alpha_w * ce * weights[..., None]


def weighted_smooth_l1(
    preds: jnp.ndarray,  # [B, A, code]
    targets: jnp.ndarray,  # [B, A, code]
    weights: jnp.ndarray,  # [B, A]
    sigma: float = 3.0,
    code_weights: Optional[Sequence[float]] = None,
    use_code_weights: bool = False,
) -> jnp.ndarray:
    """Per-element smooth-L1 [B, A, code] (codewise=True path)."""
    diff = preds - targets
    if use_code_weights and code_weights is not None:
        diff = diff * jnp.asarray(code_weights)[None, None, :]
    abs_diff = jnp.abs(diff)
    lt = (abs_diff <= 1.0 / (sigma**2)).astype(diff.dtype)
    loss = lt * 0.5 * jnp.square(abs_diff * sigma) + (abs_diff - 0.5 / (sigma**2)) * (1.0 - lt)
    return loss * weights[..., None]


def prepare_loss_weights(
    labels: jnp.ndarray,  # [B, A] int
    pos_cls_weight: float = 1.0,
    neg_cls_weight: float = 2.0,
    norm_type: str = "norm_by_num_positives",
):
    """Per-sample cls/reg weight normalization — the reference's full
    LossNormType matrix (mg_head.py:535-578):

    - norm_by_num_positives (the CBGS configs' choice): cls AND reg divided
      by the positive count,
    - norm_by_num_examples: cls by the cared (non-ignore) count, reg by the
      positive count,
    - norm_by_num_pos_neg: cls per-anchor by its own class's count (pos
      anchors by num_pos, neg anchors by num_neg), reg by the positive count,
    - dont_norm: reg by the positive count, cls unnormalized (ghm loss).
    """
    positives = labels > 0
    negatives = labels == 0
    cls_weights = negatives.astype(jnp.float32) * neg_cls_weight + positives.astype(
        jnp.float32
    ) * pos_cls_weight
    reg_weights = positives.astype(jnp.float32)
    cared = labels >= 0
    pos_normalizer = jnp.maximum(positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0)
    if norm_type == "norm_by_num_positives":
        reg_weights = reg_weights / pos_normalizer
        cls_weights = cls_weights / pos_normalizer
    elif norm_type == "norm_by_num_examples":
        num_examples = jnp.maximum(cared.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0)
        cls_weights = cls_weights / num_examples
        reg_weights = reg_weights / pos_normalizer
    elif norm_type == "norm_by_num_pos_neg":
        pos_neg = jnp.stack([positives, negatives], axis=-1).astype(jnp.float32)  # [B, A, 2]
        normalizer = pos_neg.sum(axis=1, keepdims=True)  # [B, 1, 2]
        cls_normalizer = jnp.maximum((pos_neg * normalizer).sum(-1), 1.0)  # [B, A]
        reg_weights = reg_weights / jnp.maximum(normalizer[:, :, 0], 1.0)
        cls_weights = cls_weights / cls_normalizer
    elif norm_type == "dont_norm":
        reg_weights = reg_weights / pos_normalizer
    else:
        raise ValueError(f"unknown loss norm type {norm_type!r}")
    return cls_weights, reg_weights, cared


def weighted_softmax_cross_entropy(
    logits: jnp.ndarray,  # [B, A, C]
    one_hot_targets: jnp.ndarray,  # [B, A, C]
    weights: jnp.ndarray,  # [B, A]
    logit_scale: float = 1.0,
) -> jnp.ndarray:
    """WeightedSoftmaxClassificationLoss (reference losses.py:412-455)."""
    logits = logits / logit_scale
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -(one_hot_targets * logp).sum(-1) * weights


def balanced_l1_loss(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    weights: jnp.ndarray,
    alpha: float = 0.5,
    gamma: float = 1.5,
    beta: float = 1.0,
) -> jnp.ndarray:
    """Balanced L1 (Libra R-CNN; reference losses.py BalancedL1Loss)."""
    diff = jnp.abs(preds - targets)
    b = jnp.e ** (gamma / alpha) - 1
    loss = jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log(b * diff / beta + 1) - alpha * diff,
        gamma * diff + gamma / b - alpha * beta,
    )
    return loss * weights[..., None]


def ghm_classification_loss(
    logits: jnp.ndarray,  # [B, A, C]
    targets: jnp.ndarray,  # [B, A, C] one-hot
    weights: jnp.ndarray,  # [B, A]
    bins: int = 10,
    momentum: float = 0.0,
) -> jnp.ndarray:
    """Gradient-harmonized classification loss (reference ghm_loss.py):
    per-element CE reweighted inversely to its gradient-density bin."""
    p = jax.nn.sigmoid(logits)
    g = jnp.abs(p - targets)  # gradient norm in [0, 1]
    valid = (weights > 0)[..., None] & jnp.ones_like(targets, bool)
    tot = jnp.maximum(valid.sum(), 1)
    w = jnp.zeros_like(g)
    for i in range(bins):
        lo, hi = i / bins, (i + 1) / bins + (1e-6 if i == bins - 1 else 0.0)
        in_bin = (g >= lo) & (g < hi) & valid
        num_in_bin = in_bin.sum()
        density = jnp.where(num_in_bin > 0, tot / jnp.maximum(num_in_bin, 1), 0.0)
        w = jnp.where(in_bin, density, w)
    ce = sigmoid_cross_entropy_with_logits(logits, targets)
    return ce * w / tot


def iou_regression_loss(pred_iou: jnp.ndarray, target_iou: jnp.ndarray, weights: jnp.ndarray):
    """Smooth-L1 on predicted IoU (mg_iou_head / estimator path)."""
    return weighted_smooth_l1(pred_iou[..., None], target_iou[..., None], weights, sigma=3.0)[..., 0]
