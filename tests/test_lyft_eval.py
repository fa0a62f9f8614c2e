"""Lyft kaggle-score evaluator vs hand-traced oracles (eval/lyft_eval.py;
reference semantics det3d/datasets/lyft/eval.py:43-95)."""
import numpy as np

from dal3d_tpu.eval.lyft_eval import lyft_eval, _match_counts


def _box(x, y, yaw=0.0):
    return [x, y, 0.0, 1.8, 4.2, 1.6, 0.0, 0.0, yaw]


def test_perfect_detection_scores_one():
    gt = [{"boxes": np.array([_box(0, 0), _box(10, 0)]),
           "names": np.array(["car", "pedestrian"])}]
    pred = [{"boxes": np.array([_box(0, 0), _box(10, 0)]),
             "names": np.array(["car", "pedestrian"]),
             "scores": np.array([0.9, 0.8])}]
    res = lyft_eval(gt, pred, ["car", "pedestrian"])
    assert abs(res["lyft_score"] - 1.0) < 1e-9


def test_half_precision_recall():
    """1 TP + 1 FP + 1 FN per frame -> TP/(TP+FP+FN) = 1/3 at every thr."""
    gt = [{"boxes": np.array([_box(0, 0), _box(10, 0)]),
           "names": np.array(["car", "car"])}]
    pred = [{"boxes": np.array([_box(0, 0), _box(30, 30)]),
             "names": np.array(["car", "car"]),
             "scores": np.array([0.9, 0.8])}]
    res = lyft_eval(gt, pred, ["car"])
    assert abs(res["lyft_score"] - 1.0 / 3.0) < 1e-9


def test_threshold_sweep_drops_marginal_match():
    """A det with 3D IoU ~0.58 counts below-0.6 thresholds only: score =
    (2 thresholds passing) / 10 thresholds (other rows give 0/(0+1+1))."""
    gt = [{"boxes": np.array([_box(0, 0)]), "names": np.array(["car"])}]
    shifted = _box(0.0, 0.0)
    shifted[3] = 1.8 * 0.58 / (2 - 0.58)  # engineered low-IoU partner? use shift
    pred = [{"boxes": np.array([[0.5, 0.0, 0.0, 1.8, 4.2, 1.6, 0, 0, 0.0]]),
             "names": np.array(["car"]), "scores": np.array([0.9])}]
    # IoU of 0.5m-x-shifted identical boxes: inter 1.3*4.2*h / union -> ~0.52
    res = lyft_eval(gt, pred, ["car"])
    passing = round(res["lyft_score"] * 10)
    assert 0 < passing < 10  # matched at low thresholds, dropped at high


def test_wrong_class_never_matches():
    gt = [{"boxes": np.array([_box(0, 0)]), "names": np.array(["car"])}]
    pred = [{"boxes": np.array([_box(0, 0)]), "names": np.array(["truck"]),
             "scores": np.array([0.9])}]
    res = lyft_eval(gt, pred, ["car", "truck"])
    assert res["lyft_score"] == 0.0


def test_greedy_matching_prefers_high_score():
    iou = np.array([[0.9], [0.95]])  # two dets on one gt
    tp, fp, fn = _match_counts(iou, np.array([0.5, 0.9]), 0.5)
    assert (tp, fp, fn) == (1, 1, 0)
