"""runtime/evaluation.py: predict-over-loader gathering + kitti-style val
metric (the in-training val workflow's machinery)."""
import numpy as np

from dal3d_tpu.runtime.evaluation import kitti_style_eval, predict_dataset


class _FakeDataset:
    def __init__(self, infos, class_names):
        self._infos = infos
        self._classes = class_names

    @property
    def infos(self):
        return self._infos

    @property
    def class_names(self):
        return self._classes


def _mk_info(token, boxes, names):
    return {"token": token, "gt_boxes": np.asarray(boxes, np.float32),
            "gt_names": np.asarray(names)}


def test_kitti_style_eval_perfect_detections():
    boxes = np.array([[2.0, 3.0, 0.0, 2.0, 4.6, 1.7, 0, 0, 0.3],
                      [-4.0, 1.0, 0.0, 2.0, 4.6, 1.7, 0, 0, 1.0]])
    infos = [_mk_info("t0", boxes, ["car", "car"])]
    ds = _FakeDataset(infos, ["car", "pedestrian"])
    detections = {"t0": {
        "box3d_lidar": boxes.copy(),
        "scores": np.array([0.9, 0.8], np.float32),
        "label_preds": np.zeros(2, np.int32),
        "det_valid": np.ones(2, bool),
    }}
    res = kitti_style_eval(ds, detections)
    assert res["car_3d_AP40"] > 0.9  # exact boxes -> near-perfect AP
    # only classes present in gt are evaluated
    assert not any(k.startswith("pedestrian") for k in res)


def test_kitti_style_eval_no_labels_returns_empty():
    ds = _FakeDataset([{"token": "t0", "gt_boxes": None}], ["car"])
    assert kitti_style_eval(ds, {}) == {}


def test_predict_dataset_dedups_padded_tail():
    B = 2
    det = {
        "box3d_lidar": np.zeros((B, 3, 9), np.float32),
        "scores": np.zeros((B, 3), np.float32),
        "label_preds": np.zeros((B, 3), np.int32),
        "det_valid": np.zeros((B, 3), bool),
    }

    def predict(params, stats, batch):
        return det

    # the last batch repeats token "a" (drop_last=False padding convention)
    loader = [
        {"metadata": [{"token": "a"}, {"token": "b"}], "points": None},
        {"metadata": [{"token": "c"}, {"token": "a"}], "points": None},
    ]
    out = predict_dataset(predict, None, None, loader)
    assert sorted(out) == ["a", "b", "c"]
