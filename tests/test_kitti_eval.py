"""KITTI AP eval + CenterPoint head + BEV seg head sanity."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dal3d_tpu.eval.kitti_eval import kitti_eval
from dal3d_tpu.models.bevfusion.centerpoint import (
    CenterHead, CenterTestCfg, center_head_decode, center_head_loss,
)
from dal3d_tpu.models.bevfusion.segm import (
    BEVSegmentationHead, bev_segmentation_loss, bev_segmentation_miou,
)


def test_kitti_eval_perfect_predictions():
    gt = [{
        "boxes": np.array([[0, 0, 0, 2, 4, 1.6, 0, 0, 0.3],
                           [10, 5, 0, 0.6, 0.8, 1.7, 0, 0, 1.0]], np.float32),
        "names": np.array(["Car", "Pedestrian"]),
    }]
    pred = [{
        "boxes": gt[0]["boxes"].copy(),
        "names": gt[0]["names"].copy(),
        "scores": np.array([0.9, 0.8], np.float32),
    }]
    r = kitti_eval(gt, pred, ["Car", "Pedestrian"])["results"]
    assert r["Car_3d_AP40"] > 0.95 and r["Pedestrian_bev_AP40"] > 0.95


def test_kitti_eval_misses():
    gt = [{"boxes": np.array([[0, 0, 0, 2, 4, 1.6, 0, 0, 0.0]], np.float32),
           "names": np.array(["Car"])}]
    pred = [{"boxes": np.array([[30, 30, 0, 2, 4, 1.6, 0, 0, 0.0]], np.float32),
             "names": np.array(["Car"]), "scores": np.array([0.9], np.float32)}]
    r = kitti_eval(gt, pred, ["Car"])["results"]
    assert r["Car_3d_AP40"] == 0.0


@pytest.mark.slow
def test_kitti_eval_difficulty_bins():
    """Easy GT counts in all bins; hard-only GT is ignored (not FP) in easy.

    Two GTs: one easy (tall bbox, unoccluded), one hard (short bbox, occ 2).
    Predictions hit both. Easy bin: the hard GT is ignored, so its matched
    prediction is dropped (not an FP) -> AP stays 1. Hard bin: both count.
    """
    from dal3d_tpu.eval.kitti_eval import compute_difficulty

    bbox = np.array([[0, 0, 50, 60], [0, 0, 50, 28]], np.float32)  # heights 60, 28
    occluded = np.array([0, 2])
    truncated = np.array([0.0, 0.4])
    diff = compute_difficulty(bbox, occluded, truncated)
    assert list(diff) == [0, 2]

    gt = [{
        "boxes": np.array([[0, 0, 0, 2, 4, 1.6, 0, 0, 0.0],
                           [10, 5, 0, 2, 4, 1.6, 0, 0, 0.0]], np.float32),
        "names": np.array(["Car", "Car"]),
        "bbox": bbox, "occluded": occluded, "truncated": truncated,
    }]
    pred = [{
        "boxes": gt[0]["boxes"].copy(),
        "names": np.array(["Car", "Car"]),
        "scores": np.array([0.9, 0.8], np.float32),
    }]
    r = kitti_eval(gt, pred, ["Car"])["results"]
    assert r["Car_3d_easy_AP40"] > 0.95      # hard GT ignored, no FP
    assert r["Car_3d_hard_AP40"] > 0.95      # both matched
    assert "mAP_3d_moderate" in r and r["mAP_3d"] == r["mAP_3d_moderate"]

    # a spurious extra prediction IS an FP in every bin
    pred_fp = [dict(pred[0])]
    pred_fp[0]["boxes"] = np.concatenate([pred[0]["boxes"],
                                          [[30, 30, 0, 2, 4, 1.6, 0, 0, 0.0]]]).astype(np.float32)
    pred_fp[0]["names"] = np.array(["Car"] * 3)
    pred_fp[0]["scores"] = np.array([0.9, 0.8, 0.95], np.float32)
    r2 = kitti_eval(gt, pred_fp, ["Car"])["results"]
    assert r2["Car_3d_easy_AP40"] < r["Car_3d_easy_AP40"]


def test_center_head_decode_and_loss():
    head = CenterHead(num_classes=(1, 2), share_conv_channel=16)
    bev = jnp.zeros((2, 16, 16, 32))
    var = head.init(jax.random.PRNGKey(0), bev, False)
    preds = head.apply(var, bev, False)
    assert len(preds) == 2 and preds[1]["heatmap"].shape == (2, 16, 16, 2)

    cfg = CenterTestCfg(out_size_factor=8, voxel_size=(0.125, 0.125), pc_range=(-8.0, -8.0),
                        max_per_task=8)
    dets = center_head_decode(preds, cfg)
    assert dets["box3d_lidar"].shape == (2, 16, 9)
    lab = np.asarray(dets["label_preds"])
    assert lab[:, 8:].min() >= 1  # task-1 labels offset past task-0's single class

    gt = [jnp.zeros((2, 4, 9)).at[..., 3:6].set(1.0).at[0, 0, :2].set(jnp.asarray([2.0, 3.0]))
          for _ in range(2)]
    cls = [jnp.zeros((2, 4), jnp.int32).at[0, 0].set(1) for _ in range(2)]
    logs = center_head_loss(preds, gt, cls, cfg)
    assert np.isfinite(float(logs["loss"])) and float(logs["loss"]) > 0


def test_bev_seg_head():
    head = BEVSegmentationHead(hidden=16, num_convs=1)
    bev = jnp.zeros((1, 32, 32, 24))
    var = head.init(jax.random.PRNGKey(0), bev, False)
    logits = head.apply(var, bev, False)
    assert logits.shape == (1, 32, 32, 6)
    tgt = jnp.zeros_like(logits).at[..., 0].set(1.0)
    logs = bev_segmentation_loss(logits, tgt)
    assert np.isfinite(float(logs["loss"]))
    miou = bev_segmentation_miou(logits, tgt)
    assert miou.shape == (6,)
