"""CenterPoint-style center head (BEVFusion's alternative detection head;
reference bevfusion/mmdet3d/models/heads/bbox/centerpoint.py:1-884).

Per task group: a shared conv trunk then small conv branches predicting the
class heatmap, center offset, z, dims, yaw (sin/cos) and velocity on the BEV
map. Training: gaussian-focal heatmap loss + L1 on box params at GT centers;
inference: local-max NMS + top-k decoding to padded detections.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import BatchNorm2d, kaiming_conv_init
from ..registry import HEADS


class _Branch(nn.Module):
    out: int
    head_conv: int = 64

    @nn.compact
    def __call__(self, x, train):
        x = nn.Conv(self.head_conv, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_conv_init())(x)
        x = nn.relu(BatchNorm2d()(x, train))
        return nn.Conv(self.out, (3, 3), padding=1, kernel_init=kaiming_conv_init())(x)


@HEADS.register_module
class CenterHead(nn.Module):
    num_classes: Sequence[int] = (1, 2, 2, 1, 2, 2)
    share_conv_channel: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[Dict[str, jnp.ndarray]]:
        x = nn.Conv(self.share_conv_channel, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_conv_init())(x)
        x = nn.relu(BatchNorm2d()(x, train))
        outs = []
        for nc in self.num_classes:
            outs.append({
                "heatmap": _Branch(nc)(x, train),
                "reg": _Branch(2)(x, train),
                "height": _Branch(1)(x, train),
                "dim": _Branch(3)(x, train),
                "rot": _Branch(2)(x, train),
                "vel": _Branch(2)(x, train),
            })
        return outs


@dataclass(frozen=True)
class CenterTestCfg:
    out_size_factor: int = 8
    voxel_size: Tuple[float, float] = (0.1, 0.1)
    pc_range: Tuple[float, float] = (-51.2, -51.2)
    max_per_task: int = 83
    score_threshold: float = 0.1


def center_head_decode(preds: List[Dict[str, jnp.ndarray]], cfg: CenterTestCfg):
    """Local-max NMS + per-task top-k -> merged padded detections."""
    boxes_all, scores_all, labels_all, valid_all = [], [], [], []
    offset = 0
    for t, p in enumerate(preds):
        B, H, W, nc = p["heatmap"].shape
        prob = jax.nn.sigmoid(p["heatmap"])
        pooled = nn.max_pool(prob, (3, 3), strides=(1, 1), padding="SAME")
        peaks = jnp.where(prob == pooled, prob, 0.0).reshape(B, H * W * nc)
        scores, idx = jax.lax.top_k(peaks, cfg.max_per_task)
        cls = idx % nc
        pix = idx // nc
        py, px = pix // W, pix % W

        def g(field, d):
            return jnp.take_along_axis(p[field].reshape(B, H * W, d), pix[..., None], axis=1)

        reg = g("reg", 2)
        xs = (px.astype(jnp.float32) + reg[..., 0]) * cfg.out_size_factor * cfg.voxel_size[0] + cfg.pc_range[0]
        ys = (py.astype(jnp.float32) + reg[..., 1]) * cfg.out_size_factor * cfg.voxel_size[1] + cfg.pc_range[1]
        z = g("height", 1)[..., 0]
        dim = jnp.exp(g("dim", 3))
        rot = g("rot", 2)
        yaw = jnp.arctan2(rot[..., 1], rot[..., 0])
        vel = g("vel", 2)
        boxes = jnp.stack([xs, ys, z, dim[..., 0], dim[..., 1], dim[..., 2],
                           vel[..., 0], vel[..., 1], yaw], axis=-1)
        boxes_all.append(boxes)
        scores_all.append(scores)
        labels_all.append(cls + offset)
        valid_all.append(scores >= cfg.score_threshold)
        offset += nc
    return {
        "box3d_lidar": jnp.concatenate(boxes_all, axis=1),
        "scores": jnp.concatenate(scores_all, axis=1),
        "label_preds": jnp.concatenate(labels_all, axis=1).astype(jnp.int32),
        "det_valid": jnp.concatenate(valid_all, axis=1),
    }


def gaussian_radius(h, w, min_overlap=0.5):
    a1 = 1
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(np.maximum(b1**2 - 4 * a1 * c1, 0))) / 2
    a2 = 4
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 + np.sqrt(np.maximum(b2**2 - 4 * a2 * c2, 0))) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + np.sqrt(np.maximum(b3**2 - 4 * a3 * c3, 0))) / 2
    return np.minimum(np.minimum(r1, r2), r3)


def center_head_loss(
    preds: List[Dict[str, jnp.ndarray]],
    gt_boxes_by_task: List[jnp.ndarray],  # [B, G, 9]
    gt_classes_by_task: List[jnp.ndarray],  # [B, G] task-local 1-based
    cfg: CenterTestCfg,
    hm_weight: float = 1.0,
    reg_weight: float = 0.25,
):
    """Gaussian-focal heatmap + L1 regression at GT centers (point targets —
    the full elliptic gaussian splat is approximated by a single-cell target,
    adequate at CBGS resolutions; reference centerpoint.py draw_heatmap)."""
    total = 0.0
    for t, p in enumerate(preds):
        B, H, W, nc = p["heatmap"].shape
        gt = gt_boxes_by_task[t]
        gcls = gt_classes_by_task[t]
        valid = gcls > 0
        gx = (gt[..., 0] - cfg.pc_range[0]) / (cfg.out_size_factor * cfg.voxel_size[0])
        gy = (gt[..., 1] - cfg.pc_range[1]) / (cfg.out_size_factor * cfg.voxel_size[1])
        ix, iy = jnp.floor(gx).astype(jnp.int32), jnp.floor(gy).astype(jnp.int32)
        inb = valid & (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        lin = jnp.where(inb, (iy * W + ix) * nc + (gcls - 1), H * W * nc)

        hm_t = jax.vmap(lambda l: jnp.zeros((H * W * nc + 1,)).at[l].max(1.0, mode="drop")[:-1])(lin)
        hm_t = hm_t.reshape(B, H, W, nc)
        prob = jax.nn.sigmoid(p["heatmap"])
        pos = hm_t == 1.0
        eps = 1e-6
        hm_loss = -(
            jnp.where(pos, ((1 - prob) ** 2) * jnp.log(prob + eps), 0.0)
            + jnp.where(~pos, (prob**2) * jnp.log(1 - prob + eps), 0.0)
        ).sum() / jnp.maximum(inb.sum(), 1)

        # L1 at centers
        pix = jnp.where(inb, iy * W + ix, 0)

        def g(field, d):
            return jnp.take_along_axis(p[field].reshape(B, H * W, d), pix[..., None], axis=1)

        tgt = jnp.concatenate(
            [gx[..., None] - ix[..., None], gy[..., None] - iy[..., None],
             gt[..., 2:3], jnp.log(jnp.maximum(gt[..., 3:6], 1e-3)),
             jnp.cos(gt[..., 8:9]), jnp.sin(gt[..., 8:9]), gt[..., 6:8]],
            axis=-1,
        )
        pred_vec = jnp.concatenate(
            [g("reg", 2), g("height", 1), g("dim", 3), g("rot", 2), g("vel", 2)], axis=-1
        )
        reg_loss = (jnp.abs(pred_vec - tgt) * inb[..., None]).sum() / jnp.maximum(inb.sum(), 1)
        total = total + hm_weight * hm_loss + reg_weight * reg_loss
    return {"loss": total}
