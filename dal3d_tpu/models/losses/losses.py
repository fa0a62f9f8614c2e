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
):
    """NormByNumPositives (reference mg_head.py:535-578)."""
    positives = labels > 0
    negatives = labels == 0
    cls_weights = negatives.astype(jnp.float32) * neg_cls_weight + positives.astype(
        jnp.float32
    ) * pos_cls_weight
    reg_weights = positives.astype(jnp.float32)
    pos_normalizer = jnp.maximum(positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0)
    reg_weights = reg_weights / pos_normalizer
    cls_weights = cls_weights / pos_normalizer
    cared = labels >= 0
    return cls_weights, reg_weights, cared
