"""classwise_weight evaluator + sweep loading + loader coverage."""
import numpy as np
import pytest

from dal3d_tpu.eval.matched_iou import (
    accumulate_matches, cald_consistency, class_distribution_jsdiv,
    ppal_difficulty_weights, scale_iou,
)


def test_scale_iou():
    assert scale_iou([2, 4, 2], [2, 4, 2]) == pytest.approx(1.0)
    assert scale_iou([2, 4, 2], [1, 4, 2]) == pytest.approx(0.5)


def frames(boxes, names, scores=None, token="t0"):
    return {token: {"boxes": np.asarray(boxes, np.float32),
                    "names": np.asarray(names),
                    "scores": None if scores is None else np.asarray(scores, np.float32)}}


def test_accumulate_basic_match():
    gt = frames([[0, 0, 0, 2, 4, 2, 0, 0, 0], [10, 0, 0, 2, 4, 2, 0, 0, 0]],
                ["car", "car"])
    pred = frames([[0.5, 0, 0, 2, 4, 2, 0, 0, 0], [30, 0, 0, 2, 4, 2, 0, 0, 0]],
                  ["car", "car"], scores=[0.9, 0.8])
    d = accumulate_matches(gt, pred, ["car"], dist_th=2.0)
    rec = d["t0"]
    assert rec["name"] == ["car"]  # only the close one matches
    assert rec["detection_score"] == [pytest.approx(0.9)]
    assert rec["iou"][0] == pytest.approx(1.0)
    assert rec["ref_score"][0] == 1.0  # GT side


def test_accumulate_greedy_one_to_one():
    gt = frames([[0, 0, 0, 2, 4, 2, 0, 0, 0]], ["car"])
    pred = frames([[0.1, 0, 0, 2, 4, 2, 0, 0, 0], [0.2, 0, 0, 2, 4, 2, 0, 0, 0]],
                  ["car", "car"], scores=[0.5, 0.9])
    d = accumulate_matches(gt, pred, ["car"], dist_th=2.0)
    # higher-scored prediction takes the GT; the other goes unmatched
    assert len(d["t0"]["name"]) == 1
    assert d["t0"]["detection_score"][0] == pytest.approx(0.9)


def test_reference_matching_semantics():
    """Oracle for the reference's exact matching rules: dist_th=1.0 default
    (classwise_weight/evaluate.py:116) + detection_cvpr_2019 per-class range
    filtering (evaluate.py:93-96)."""
    # default threshold is 1.0 m: a 1.5 m-off pred no longer matches
    gt = frames([[0, 0, 0, 2, 4, 2, 0, 0, 0]], ["car"])
    pred = frames([[1.5, 0, 0, 2, 4, 2, 0, 0, 0]], ["car"], scores=[0.9])
    assert accumulate_matches(gt, pred, ["car"]) == {}
    pred = frames([[0.8, 0, 0, 2, 4, 2, 0, 0, 0]], ["car"], scores=[0.9])
    assert len(accumulate_matches(gt, pred, ["car"])["t0"]["name"]) == 1

    # class ranges: a barrier at 35 m (> 30 m range) is filtered on BOTH
    # sides; a car at 35 m (< 50 m range) still matches
    gt = frames([[35, 0, 0, 1, 2, 1, 0, 0, 0], [35, 5, 0, 2, 4, 2, 0, 0, 0]],
                ["barrier", "car"])
    pred = frames([[35.2, 0, 0, 1, 2, 1, 0, 0, 0], [35.2, 5, 0, 2, 4, 2, 0, 0, 0]],
                  ["barrier", "car"], scores=[0.9, 0.9])
    d = accumulate_matches(gt, pred, ["barrier", "car"])
    assert d["t0"]["name"] == ["car"]

    # greedy order + taken set still hold under the tight threshold: two preds
    # at 0.4 m / 0.6 m from one gt -> only the higher-scored matches
    gt = frames([[0, 0, 0, 2, 4, 2, 0, 0, 0]], ["car"])
    pred = frames([[0.4, 0, 0, 2, 4, 2, 0, 0, 0], [0.6, 0, 0, 2, 4, 2, 0, 0, 0]],
                  ["car", "car"], scores=[0.5, 0.9])
    d = accumulate_matches(gt, pred, ["car"])
    assert len(d["t0"]["name"]) == 1
    assert d["t0"]["detection_score"][0] == pytest.approx(0.9)


def test_ppal_weights_monotone():
    d = {"t0": {"name": ["car", "ped"], "detection_score": [0.9, 0.3],
                "iou": [0.9, 0.3], "ref_score": [1, 1]}}
    w = ppal_difficulty_weights(d)
    assert w["ped"] > w["car"]  # lower quality -> higher difficulty


def test_cald_consistency_ordering():
    d = {"a": {"name": ["car"], "detection_score": [0.9], "iou": [0.95], "ref_score": [0.9]},
         "b": {"name": ["car"], "detection_score": [0.2], "iou": [0.3], "ref_score": [0.9]}}
    cons, order = cald_consistency(d, ["a", "b"])
    # frame 'a' is highly consistent (|0.95 + ~0.9 - 1.3| small?) vs 'b'
    assert set(order) == {0, 1}
    assert cons["b"] != cons["a"]


def test_class_jsdiv():
    d = {"a": {"name": ["car", "car"], "detection_score": [], "iou": [], "ref_score": []},
         "b": {"name": ["ped"], "detection_score": [], "iou": [], "ref_score": []}}
    js = class_distribution_jsdiv(d, ["a", "b", "c"], ["car", "ped"])
    assert js[2] == 1.0  # empty frame -> max divergence
    assert 0 <= js[0] <= 1 and 0 <= js[1] <= 1


def test_sweep_loading(tmp_path):
    from dal3d_tpu.data.datasets.synthetic import make_synthetic_nuscenes
    from dal3d_tpu.data.datasets.nuscenes import NuScenesDataset

    info_path = make_synthetic_nuscenes(str(tmp_path), n_frames=2, points_per_frame=500,
                                        range_xy=7)
    pipeline = [
        dict(type="LoadPointCloudFromFile", dataset="NuScenesDataset"),
        dict(type="LoadPointCloudAnnotations", with_bbox=True),
        dict(type="Preprocess", cfg=dict(mode="val", shuffle_points=False)),
        dict(type="ReformatFixedShape", max_gt=16),
    ]
    tasks = [dict(num_class=1, class_names=["car"])]
    ds10 = NuScenesDataset(info_path=info_path, nsweeps=10, class_names=["car"],
                           pipeline=pipeline, tasks=tasks, max_points=20000, test_mode=True)
    ds1 = NuScenesDataset(info_path=info_path, nsweeps=1, class_names=["car"],
                          pipeline=pipeline, tasks=tasks, max_points=20000, test_mode=True)
    e10, e1 = ds10[0], ds1[0]
    # 10 sweeps concat ~10x the points of a single sweep (capped by max_points)
    assert e10["points_valid"].sum() > e1["points_valid"].sum() * 5
    # 5th feature = time lag: keyframe 0, sweeps > 0
    t = e10["points"][e10["points_valid"]][:, 4]
    assert (t == 0).any() and (t > 0).any()
