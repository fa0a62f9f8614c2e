"""Official KITTI eval (eval/kitti_official.py) against hand-traced oracles.

Fixtures are built in camera coordinates with exact-overlap boxes so every
matching decision (clean_data partition, greedy matching, threshold
sampling, envelope) can be traced by hand against the reference algorithm
(det3d/datasets/utils/kitti_object_eval_python/eval.py). The official
41-recall-sample threshold scheme needs >=41 matched detections to populate
the curve (with fewer, AP degenerates — faithfully reproduced here in
test_sparse_sampling_artifact), so the main fixtures use 60 GT boxes.
"""
import numpy as np
import pytest

from dal3d_tpu.eval import kitti_official as ko


def _anno(names, boxes3d=None, bboxes=None, scores=None, alphas=None,
          occluded=None, truncated=None):
    n = len(names)
    boxes3d = np.asarray(boxes3d if boxes3d is not None else np.zeros((n, 7)))
    return {
        "name": np.asarray(names),
        "bbox": np.asarray(bboxes if bboxes is not None else
                           np.tile([0, 0, 100, 100], (n, 1)), np.float64).reshape(n, 4),
        "location": boxes3d[:, :3].astype(np.float64),
        "dimensions": boxes3d[:, 3:6].astype(np.float64),
        "rotation_y": boxes3d[:, 6].astype(np.float64),
        "alpha": np.asarray(alphas if alphas is not None else np.zeros(n), np.float64),
        "occluded": np.asarray(occluded if occluded is not None else np.zeros(n, np.int64)),
        "truncated": np.asarray(truncated if truncated is not None else np.zeros(n)),
        **({"score": np.asarray(scores, np.float64)} if scores is not None else {}),
    }


def _car(x, z, ry=0.0):
    # location (x, y=bottom, z), dims (l, h, w)
    return [x, 1.5, z, 4.0, 1.5, 1.8, ry]


def _bbox(i):
    return [10 + 5 * i, 10, 110 + 5 * i, 60]  # height 50 > 40 (easy)


def _grid_scene(n=60, extra_dt=(), gt_extra=(), dt_alpha=None):
    """n perfectly-detected cars on a grid (+ optional extras)."""
    gts, dts = [], []
    for f in range(3):
        idx = range(f * n // 3, (f + 1) * n // 3)
        names = ["Car"] * len(list(idx))
        boxes = [_car(10 * (i % 10), 10 + 10 * (i // 10)) for i in idx]
        bbs = [_bbox(i % 20) for i in idx]
        scores = [0.99 - 0.01 * i for i in idx]
        alphas = [0.0] * len(names) if dt_alpha is None else [dt_alpha] * len(names)
        g_names, g_boxes, g_bbs = list(names), list(boxes), list(bbs)
        d_names, d_boxes, d_bbs = list(names), list(boxes), list(bbs)
        d_scores, d_alphas = list(scores), list(alphas)
        if f == 0:
            for nm, b3, bb in gt_extra:
                g_names.append(nm); g_boxes.append(b3); g_bbs.append(bb)
            for nm, b3, bb, sc in extra_dt:
                d_names.append(nm); d_boxes.append(b3); d_bbs.append(bb)
                d_scores.append(sc); d_alphas.append(0.0)
        gts.append(_anno(g_names, g_boxes, g_bbs))
        dts.append(_anno(d_names, d_boxes, d_bbs, scores=d_scores, alphas=d_alphas))
    return gts, dts


def test_perfect_detection_all_100():
    gt, dt = _grid_scene()
    res = ko.get_official_eval_result(gt, dt, ["Car"])
    for metric in ("bbox", "bev", "3d"):
        for d in ("easy", "moderate", "hard"):
            assert res[f"{'Car'}_{metric}_{d}_R11"] == 100.0
            assert res[f"{'Car'}_{metric}_{d}_R40"] == 100.0
    assert res["Car_aos_moderate_R11"] == 100.0


def test_aos_penalizes_flipped_orientation():
    gt, dt = _grid_scene(dt_alpha=np.pi)  # every det alpha off by pi
    res = ko.get_official_eval_result(gt, dt, ["Car"])
    assert res["Car_bbox_moderate_R11"] == 100.0
    assert abs(res["Car_aos_moderate_R11"]) < 1e-6  # (1+cos(pi))/2 = 0


def test_van_neither_tp_nor_fp_for_car():
    """A det matched to a Van is absorbed (not FP); the Van is not counted."""
    van = ("Van", _car(90, 90), _bbox(19))
    det_on_van = ("Car", _car(90, 90), _bbox(19), 0.5)
    gt, dt = _grid_scene(gt_extra=[van], extra_dt=[det_on_van])
    res = ko.get_official_eval_result(gt, dt, ["Car"])
    assert res["Car_3d_moderate_R11"] == 100.0
    assert res["Car_3d_moderate_R40"] == 100.0


def test_unmatched_det_is_fp():
    stray = ("Car", _car(90, 95), _bbox(19), 0.5)  # lowest score, no GT
    gt, dt = _grid_scene(extra_dt=[stray])
    res = ko.get_official_eval_result(gt, dt, ["Car"])
    # the stray's score (0.5) is below every threshold sampled from the 60
    # matched scores (0.99..0.40)? No: thresholds go down to ~0.40 over 41
    # samples, so late thresholds include the FP -> precision dips at the
    # tail; AP strictly between 95 and 100
    assert 95.0 < res["Car_3d_moderate_R40"] < 100.0


def test_dontcare_region_absorbs_fp_bbox_metric():
    dc = ("DontCare", _car(0, 0), [300, 10, 400, 60])
    stray = ("Car", _car(90, 95), [300, 10, 400, 60], 0.5)  # inside DC region
    gt, dt = _grid_scene(gt_extra=[dc], extra_dt=[stray])
    res = ko.get_official_eval_result(gt, dt, ["Car"])
    assert res["Car_bbox_moderate_R40"] == 100.0  # DC absorbed the stray det
    assert res["Car_3d_moderate_R40"] < 100.0  # no DC logic in 3d -> FP


def test_difficulty_bins_ignore_small_gt():
    """GT with 30px image height: counted for moderate/hard, ignored for
    easy (its matched det is absorbed, not FP)."""
    small_bbox = [10, 10, 110, 40]  # height 30 < 40
    small_gt = ("Car", _car(90, 90), small_bbox)
    small_det = ("Car", _car(90, 90), small_bbox, 0.5)
    gt, dt = _grid_scene(gt_extra=[small_gt], extra_dt=[small_det])
    res = ko.get_official_eval_result(gt, dt, ["Car"])
    assert res["Car_3d_easy_R40"] == 100.0
    assert res["Car_3d_moderate_R40"] == 100.0  # counted and matched


def test_sparse_sampling_artifact():
    """2 GT, 1 detected: the official 41-sample scheme leaves only recall
    sample 0 populated -> R11 = 100/11, R40 = 0 (hand-traced vs eval.py)."""
    gt = [_anno(["Car", "Car"], [_car(0, 10), _car(5, 20)], [_bbox(0), _bbox(1)])]
    dt = [_anno(["Car"], [_car(0, 10)], [_bbox(0)], scores=[0.9], alphas=[-10])]
    res = ko.get_official_eval_result(gt, dt, ["Car"])
    assert abs(res["Car_3d_moderate_R11"] - 100.0 / 11) < 1e-6
    assert res["Car_3d_moderate_R40"] == 0.0


def test_loose_overlap_row():
    """Dets shifted 0.8m: IoU ~0.55 fails the 0.7 row, passes the 0.5 row."""
    gt, _ = _grid_scene()
    _, dt = _grid_scene()
    for d in dt:
        d["location"] = d["location"] + np.array([0.8, 0.0, 0.0])
    res = ko.get_official_eval_result(gt, dt, ["Car"])
    assert res["Car_3d_moderate_R40"] == 0.0
    assert res["Car_3d_moderate_loose_R40"] == 100.0


def test_bev_rotated_iou_exact():
    """Rotated-box IoU sanity: 90-degree rotation of a square = same box."""
    b = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    q = np.array([[0.0, 0.0, 2.0, 2.0, np.pi / 2]])
    iou = ko.bev_box_overlap(b, q)
    assert abs(iou[0, 0] - 1.0) < 1e-6
    q2 = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
    iou2 = ko.bev_box_overlap(b, q2)
    assert abs(iou2[0, 0] - 2.0 / 6.0) < 1e-6


def test_coco_eval_sweep_matches_single_overlap_for_exact_dets():
    """With exact-overlap detections (IoU 1.0 everywhere), every overlap in
    the coco sweep yields the same AP, so the mean equals the official
    single-threshold value."""
    gts, dts = _grid_scene()
    coco = ko.get_coco_eval_result(gts, dts, ["Car"])
    official = ko.get_official_eval_result(gts, dts, ["Car"])
    for metric in ("bbox", "bev", "3d"):
        for d in ("easy", "moderate", "hard"):
            assert coco[f"Car_{metric}_{d}_coco_R40"] == pytest.approx(
                official[f"Car_{metric}_{d}_R40"]
            )
