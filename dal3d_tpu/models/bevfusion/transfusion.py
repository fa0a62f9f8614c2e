"""TransFusion detection head.

Re-design of bevfusion/mmdet3d/models/heads/bbox/transfusion.py:37-851:
- dense heatmap on the fused BEV map; class-aware local-maximum NMS
  (3x3 max-pool equality) + top-``num_proposals`` query initialization
  (:236-279) — fixed-shape top_k, no dynamic filtering,
- one transformer decoder layer: query self-attention + cross-attention to
  the flattened BEV map with learned positional encodings,
- FFN prediction branches per box parameter (center/height/dim/rot/vel/
  heatmap),
- training: Hungarian assignment on the reference's full matching cost,
  solved ON DEVICE by a jittable Jonker-Volgenant kernel (ops/lsa.py),
  then focal cls + L1 reg + gaussian-focal heatmap losses,
- inference: decode to padded detections.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import BatchNorm2d, kaiming_conv_init
from ..losses.losses import sigmoid_focal_loss


class PositionEmbeddingLearned(nn.Module):
    """Learned absolute position MLP (reference utils/transformer.py:14-29):
    Conv1d(2, d, 1) + BN1d + ReLU + Conv1d(d, d, 1). k=1 Conv1d == Dense;
    torch BN1d defaults eps 1e-5 / momentum 0.1."""

    dim: int

    @nn.compact
    def __call__(self, xy, train: bool = False):  # [B, N, 2]
        x = nn.Dense(self.dim, name="fc1")(xy)
        x = BatchNorm2d(momentum=0.9, epsilon=1e-5, name="bn")(x, train)
        x = nn.relu(x)
        return nn.Dense(self.dim, name="fc2")(x)


class PredFFN(nn.Module):
    """One prediction branch (reference utils/transformer.py:496-540 FFN):
    ConvModule(d -> 64, k=1, BN1d, ReLU) + Conv1d(64 -> out, k=1, bias);
    the heatmap branch's final bias starts at init_bias = -2.19."""

    out: int
    head_conv: int = 64
    init_bias: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, P, C]
        # ConvModule bias="auto" + BN1d norm -> conv bias False
        x = nn.Dense(self.head_conv, use_bias=False, name="conv0")(x)
        x = BatchNorm2d(momentum=0.9, epsilon=1e-5, name="bn0")(x, train)
        x = nn.relu(x)
        return nn.Dense(
            self.out, name="out",
            bias_init=nn.initializers.constant(self.init_bias),
        )(x)


class DecoderLayer(nn.Module):
    """Post-norm transformer decoder layer (reference utils/transformer.py:
    33-111): positional encodings are added to q, k AND v in both the query
    self-attention and the BEV cross-attention (:94-101)."""

    dim: int = 128
    heads: int = 8
    ffn_dim: int = 256
    dropout: float = 0.1  # reference TransformerDecoderLayer dropout1/2/3 + FFN

    @nn.compact
    def __call__(self, q, q_pos, kv, kv_pos, train: bool = False):
        """q [B,P,C], kv [B,HW,C] with positional encodings."""
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)  # noqa: E731
        qe = q + q_pos
        sa = nn.MultiHeadDotProductAttention(num_heads=self.heads)(
            qe, inputs_k=qe, inputs_v=qe)
        q = nn.LayerNorm()(q + drop(sa))
        ke = kv + kv_pos
        ca = nn.MultiHeadDotProductAttention(num_heads=self.heads)(
            q + q_pos, inputs_k=ke, inputs_v=ke
        )
        q = nn.LayerNorm()(q + drop(ca))
        y = nn.Dense(self.ffn_dim)(q)
        y = drop(nn.relu(y))
        y = nn.Dense(self.dim)(y)
        return nn.LayerNorm()(q + drop(y))


class TransFusionHead(nn.Module):
    num_classes: int = 10
    num_proposals: int = 200
    hidden_channel: int = 128
    num_heads: int = 8
    ffn_channel: int = 256
    code_size: int = 10  # x,y offset(2) + height(1) + dim(3) + rot(2) + vel(2)
    nms_kernel_size: int = 3
    dataset: str = "nuScenes"  # classes 8/9 skip the local-max NMS (ref :248-256)

    @nn.compact
    def __call__(self, bev, train: bool = False):
        """bev [B, H, W, C] -> dict of per-proposal predictions + heatmap.

        Layer-for-layer faithful to reference transfusion.py:95-311 so that
        torch checkpoints convert 1:1 (models/bevfusion/convert_bevfusion.py):
        plain shared_conv (no norm), ConvModule+conv heatmap head, Conv1d
        class encoding, separate self/cross PositionEmbeddingLearned MLPs,
        BN'd 64-wide prediction FFNs.

        Layout note: the reference BEV map is [B, C, X, Y] (its vendored
        voxelizer emits (x,y,z) coords, sparse_shape [1440,1440,41], so
        row = x-cells) and bev_pos channel 0 = row + 0.5 = x-cells + 0.5
        (create_2D_grid :173-183 with the "NOTE: modified" meshgrid order;
        the heatmap gaussian is drawn at center_int[[1,0]] :570-574, i.e.
        row = x). Our BEV map keeps the Det3D (z,y,x) layout: row = y-cells,
        col = x-cells. We therefore feed the pos-MLPs the SAME semantic
        vector — (x-cells + 0.5, y-cells + 0.5) — so converted torch
        pos-MLP/FFN weights apply verbatim; only conv kernels need an
        H<->W transpose in the converter (ref :307 adds query_pos to the
        center output before decode, decode treats channel 0 as x)."""
        B, H, W, C = bev.shape
        P, nc, d = self.num_proposals, self.num_classes, self.hidden_channel

        x = nn.Conv(d, (3, 3), padding=1, use_bias=True,
                    kernel_init=kaiming_conv_init(), name="shared_conv")(bev)

        # dense heatmap (class-aware): ConvModule(d, d, 3, bias="auto" ->
        # False before BN) + Conv(d, nc, 3, bias)
        h = nn.Conv(d, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_conv_init(), name="heatmap_conv")(x)
        # ConvModule's BN2d is a torch-default BatchNorm2d (eps 1e-5,
        # momentum 0.1 -> flax 0.9), like every other BN in this head
        h = nn.relu(BatchNorm2d(momentum=0.9, epsilon=1e-5,
                                name="heatmap_bn")(h, train))
        heatmap = nn.Conv(nc, (3, 3), padding=1, use_bias=True,
                          kernel_init=kaiming_conv_init(), name="heatmap_out")(h)

        # query init (ref :240-267): local-max NMS with the padding ring
        # excluded; nuScenes classes 8/9 (pedestrian, traffic_cone) keep the
        # raw heatmap (kernel-1 pool); top-P over the CLASS-MAJOR flatten.
        prob = jax.nn.sigmoid(heatmap)
        k = self.nms_kernel_size
        pad = k // 2
        pooled = nn.max_pool(prob, (k, k), strides=(1, 1), padding="SAME")
        yy0 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xx0 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        inner = ((yy0 >= pad) & (yy0 < H - pad) & (xx0 >= pad) & (xx0 < W - pad))
        local_max = jnp.where(inner[None, :, :, None], pooled, 0.0)
        raw_classes = None  # classes whose peaks skip the local-max NMS
        if self.dataset == "nuScenes" and nc == 10:
            raw_classes = jnp.arange(nc) >= 8  # pedestrian, traffic_cone
        elif self.dataset == "Waymo" and nc >= 3:
            # reference :257-262: Pedestrian & Cyclist (classes 1, 2)
            raw_classes = (jnp.arange(nc) == 1) | (jnp.arange(nc) == 2)
        if raw_classes is not None:
            local_max = jnp.where(raw_classes[None, None, None, :], prob, local_max)
        masked = prob * (prob == local_max)
        flat = masked.transpose(0, 3, 1, 2).reshape(B, nc * H * W)
        top_scores, top_idx = jax.lax.top_k(flat, P)  # [B, P]
        cls_id = top_idx // (H * W)
        pix = top_idx % (H * W)
        qy, qx = pix // W, pix % W

        feat_flat = x.reshape(B, H * W, d)
        q_feat = jnp.take_along_axis(feat_flat, pix[..., None], axis=1)  # [B,P,d]
        # Conv1d(nc, d, 1) over the one-hot class == Dense with bias (ref :287)
        cls_emb = nn.Dense(d, name="class_encoding")(jax.nn.one_hot(cls_id, nc))
        q_feat = q_feat + cls_emb

        # positional encodings: channel 0 = x-cells, channel 1 = y-cells
        # (see docstring); query pos = bev_pos gathered at the query pixel
        q_xy = jnp.stack([qx, qy], axis=-1).astype(jnp.float32) + 0.5
        kv_xy = (jnp.stack([xx0, yy0], axis=-1).reshape(1, H * W, 2)
                 .astype(jnp.float32) + 0.5)
        kv_xy = jnp.broadcast_to(kv_xy, (B, H * W, 2))
        q_pos = PositionEmbeddingLearned(d, name="self_posembed")(q_xy, train)
        kv_pos = PositionEmbeddingLearned(d, name="cross_posembed")(kv_xy, train)

        q = DecoderLayer(d, self.num_heads, self.ffn_channel, name="decoder0")(
            q_feat, q_pos, feat_flat, kv_pos, train)

        # prediction FFNs (reference: center, height, dim, rot, vel, heatmap)
        center = PredFFN(2, name="pred_center")(q, train)  # offset from query pos
        height = PredFFN(1, name="pred_height")(q, train)
        dim = PredFFN(3, name="pred_dim")(q, train)
        rot = PredFFN(2, name="pred_rot")(q, train)
        vel = PredFFN(2, name="pred_vel")(q, train)
        cls_logits = PredFFN(nc, init_bias=-2.19, name="pred_heatmap")(q, train)
        return {
            "center": center + q_xy,
            "height": height,
            "dim": dim,
            "rot": rot,
            "vel": vel,
            "cls_logits": cls_logits,
            "heatmap": heatmap,
            "query_labels": cls_id,
            "query_score": top_scores,
        }


@dataclass(frozen=True)
class TransFusionTestCfg:
    out_size_factor: int = 8
    voxel_size: Tuple[float, float] = (0.075, 0.075)
    pc_range: Tuple[float, float] = (-54.0, -54.0)
    score_threshold: float = 0.0
    max_detections: int = 200


def transfusion_decode(preds: Dict[str, jnp.ndarray], cfg: TransFusionTestCfg):
    """Decode proposals to lidar-frame boxes [B, P, 9] + scores/labels
    (reference get_bboxes :715-780)."""
    vx, vy = cfg.voxel_size
    f = cfg.out_size_factor
    cx = preds["center"][..., 0] * f * vx + cfg.pc_range[0]
    cy = preds["center"][..., 1] * f * vy + cfg.pc_range[1]
    w, l, h = (jnp.exp(preds["dim"][..., i]) for i in range(3))
    yaw = jnp.arctan2(preds["rot"][..., 1], preds["rot"][..., 0])
    z = preds["height"][..., 0]
    boxes = jnp.stack(
        [cx, cy, z, w, l, h, preds["vel"][..., 0], preds["vel"][..., 1], yaw], axis=-1
    )
    # reference get_bboxes :724-731: the per-proposal class is FORCED to the
    # query's init class (one_hot(query_labels) mask) and the score is
    # sigmoid(logit at that class) * the masked-heatmap query score
    probs = jax.nn.sigmoid(preds["cls_logits"])
    labels = preds["query_labels"]
    score_at_q = jnp.take_along_axis(probs, labels[..., None], axis=-1)[..., 0]
    scores = score_at_q * preds["query_score"]
    valid = scores > cfg.score_threshold
    return {"box3d_lidar": boxes, "scores": scores, "label_preds": labels, "det_valid": valid}


def transfusion_loss(
    preds: Dict[str, jnp.ndarray],
    gt_boxes: jnp.ndarray,  # [B, G, 9] padded (lidar frame)
    gt_classes: jnp.ndarray,  # [B, G] 1-based global; 0 pad
    cfg: TransFusionTestCfg,
    cls_weight: float = 1.0,
    bbox_weight: float = 0.25,
    heatmap_weight: float = 1.0,
    code_weights: Tuple[float, ...] = (1.0,) * 8 + (0.2, 0.2),
    gaussian_overlap: float = 0.1,
    min_radius: int = 2,
    cost_cls_weight: float = 0.15,
    cost_reg_weight: float = 0.25,
    cost_iou_weight: float = 0.25,
):
    """Hungarian-matched losses with the reference's full matching cost
    (bevfusion hungarian_assigner.py:82-124 + configs/.../transfusion/
    default.yaml): FocalLossCost*0.15 + BBoxBEVL1Cost*0.25 + IoU3DCost*0.25,
    gaussian-radius heatmap targets (transfusion.py:540-576) and
    code-weighted L1 regression."""
    dec = transfusion_decode(preds, cfg)
    boxes = dec["box3d_lidar"]  # [B, P, 9]
    B, P = boxes.shape[:2]
    G = gt_boxes.shape[1]
    nc = preds["cls_logits"].shape[-1]

    probs = jax.nn.sigmoid(preds["cls_logits"])  # [B, P, nc]
    gt_valid = gt_classes > 0
    gcls = jnp.clip(gt_classes - 1, 0, nc - 1)

    # FocalLossCost (mmdet): pos_cost - neg_cost at the gt class
    eps = 1e-8
    alpha, gamma = 0.25, 2.0
    pos_cost = -jnp.log(probs + eps) * alpha * jnp.power(1 - probs, gamma)
    neg_cost = -jnp.log(1 - probs + eps) * (1 - alpha) * jnp.power(probs, gamma)
    focal_tbl = pos_cost - neg_cost  # [B, P, nc]
    cls_cost = jnp.take_along_axis(
        focal_tbl[:, :, None, :],
        jnp.broadcast_to(gcls[:, None, :, None], (B, P, G, 1)), axis=-1,
    )[..., 0]

    # BBoxBEVL1Cost: L1 on [0,1]-normalized BEV centers; each axis is
    # normalized by its OWN extent (reference hungarian_assigner.py BBoxBEVL1:
    # pc_range[3:5] - pc_range[0:2]), recovered here from the heatmap grid
    hm_h, hm_w = preds["heatmap"].shape[1:3]
    span = jnp.asarray([
        hm_w * cfg.out_size_factor * cfg.voxel_size[0],
        hm_h * cfg.out_size_factor * cfg.voxel_size[1],
    ])
    nb = (boxes[..., :2] - jnp.asarray(cfg.pc_range)) / span
    ng = (gt_boxes[..., :2] - jnp.asarray(cfg.pc_range)) / span
    reg_cost = jnp.abs(nb[:, :, None] - ng[:, None, :]).sum(-1)

    # IoU3DCost: -3D IoU (lidar frame; boxes_iou3d expects z = bottom)
    from ...ops.rotated_iou import boxes_iou3d

    def to_bottom(b):
        return b.at[..., 2].add(-b[..., 5] / 2)

    iou = jax.vmap(boxes_iou3d)(to_bottom(boxes), to_bottom(gt_boxes))  # [B, P, G]

    cost = cost_cls_weight * cls_cost + cost_reg_weight * reg_cost - cost_iou_weight * iou
    cost = jnp.where(gt_valid[:, None, :], cost, 1e6)

    # Hungarian matching on device (ops/lsa.py) — the padded-invalid GT rows
    # are constant (1e6) after the transpose, so they cannot perturb which
    # proposals the valid rows take; they are masked out of `assign` below.
    from ...ops.lsa import linear_sum_assignment

    col4row = jax.vmap(linear_sum_assignment)(
        jnp.swapaxes(jax.lax.stop_gradient(cost), 1, 2)  # [B, G, P]
    )  # [B, G]: proposal index per gt
    gidx = jnp.where(gt_valid, jnp.arange(G, dtype=jnp.int32), -1)
    assign = jax.vmap(
        # col4row may be -1 (more GT rows than proposals) -> dropped write
        lambda c, g: jnp.full(P, -1, jnp.int32)
        .at[jnp.where(c >= 0, c, P)]
        .set(g, mode="drop")
    )(col4row, gidx)
    matched = assign >= 0
    tgt_boxes = jnp.take_along_axis(gt_boxes, jnp.maximum(assign, 0)[..., None], axis=1)
    tgt_cls = jnp.take_along_axis(gt_classes, jnp.maximum(assign, 0), axis=1)  # 1-based

    # classification: focal, matched -> gt class, unmatched -> background
    one_hot = jax.nn.one_hot(jnp.where(matched, tgt_cls - 1, nc), nc + 1)[..., :nc]
    cls_loss = sigmoid_focal_loss(
        preds["cls_logits"], one_hot, jnp.ones((B, P)), gamma=2.0, alpha=0.25
    ).sum() / jnp.maximum(matched.sum(), 1)

    # regression L1 on raw targets (center/dim-log/height/rot/vel)
    tgt = jnp.concatenate(
        [
            (tgt_boxes[..., :2] - jnp.asarray(cfg.pc_range)) / (
                cfg.out_size_factor * jnp.asarray(cfg.voxel_size)
            ),
            tgt_boxes[..., 2:3],
            jnp.log(jnp.maximum(tgt_boxes[..., 3:6], 1e-3)),
            jnp.cos(tgt_boxes[..., 8:9]),
            jnp.sin(tgt_boxes[..., 8:9]),
            tgt_boxes[..., 6:8],
        ],
        axis=-1,
    )
    pred_vec = jnp.concatenate(
        [preds["center"], preds["height"], preds["dim"], preds["rot"], preds["vel"]], axis=-1
    )
    cw = jnp.asarray(code_weights, pred_vec.dtype)
    reg_loss = (jnp.abs(pred_vec - tgt) * cw * matched[..., None]).sum() / jnp.maximum(
        matched.sum(), 1
    )

    # heatmap: gaussian-radius splat targets + penalty-reduced focal loss
    # (reference transfusion.py:540-576 + GaussianFocalLoss)
    from .gaussian import draw_gaussian_heatmap, gaussian_focal_loss, gaussian_radius

    hm = preds["heatmap"]
    Hh, Wh = hm.shape[1:3]
    f = cfg.out_size_factor
    gx = (gt_boxes[..., 0] - cfg.pc_range[0]) / (f * cfg.voxel_size[0])
    gy = (gt_boxes[..., 1] - cfg.pc_range[1]) / (f * cfg.voxel_size[1])
    w_cells = gt_boxes[..., 3] / cfg.voxel_size[0] / f
    l_cells = gt_boxes[..., 4] / cfg.voxel_size[1] / f
    radius = jnp.maximum(
        jnp.floor(gaussian_radius(l_cells, w_cells, gaussian_overlap)).astype(jnp.int32),
        min_radius,
    )
    inb = gt_valid & (gx >= 0) & (gx < Wh) & (gy >= 0) & (gy < Hh) & (
        w_cells > 0) & (l_cells > 0)
    target_hm = draw_gaussian_heatmap(
        jnp.stack([gx, gy], -1), radius, gcls, inb, Hh, Wh, nc
    )
    hm_loss = gaussian_focal_loss(hm, target_hm).sum() / jnp.maximum(inb.sum(), 1)

    total = cls_weight * cls_loss + bbox_weight * reg_loss + heatmap_weight * hm_loss
    return {"loss": total, "cls_loss": cls_loss, "reg_loss": reg_loss, "heatmap_loss": hm_loss,
            "num_matched": matched.sum()}
