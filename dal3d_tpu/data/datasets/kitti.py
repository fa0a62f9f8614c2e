"""KITTI dataset (secondary dataset of the reference, det3d/datasets/kitti/).

Infos-pkl driven like the nuScenes path: each info carries
{velodyne_path, image_idx, calib{R0_rect, Tr_velo_to_cam, P2}, annos{name,
truncated, occluded, alpha, bbox, dimensions(l,h,w), location(cam), rotation_y}}.
Boxes convert camera->lidar at load; the pipeline/reformat stages are shared
with nuScenes. Evaluation uses the native AP implementation in
``kitti_eval`` (re-design of det3d/datasets/utils/kitti_object_eval_python).
"""
from __future__ import annotations

import pickle
from typing import List, Optional

import numpy as np

from ..pipelines.preprocess import Preprocess, ReformatFixedShape
from .nuscenes import build_pipeline


def camera_to_lidar_boxes(annos: dict, calib: dict) -> np.ndarray:
    """KITTI camera-frame boxes -> lidar [N, 9] (vx=vy=0)."""
    loc = np.asarray(annos["location"], np.float64).reshape(-1, 3)
    dims = np.asarray(annos["dimensions"], np.float64).reshape(-1, 3)  # l, h, w
    ry = np.asarray(annos["rotation_y"], np.float64).reshape(-1)
    rect = np.asarray(calib["R0_rect"], np.float64)
    trv2c = np.asarray(calib["Tr_velo_to_cam"], np.float64)
    # cam -> lidar: x_l = inv(Tr) @ inv(R0) @ x_cam
    xyz1 = np.hstack([loc, np.ones((len(loc), 1))])
    m = np.linalg.inv(rect @ trv2c)
    xyz = (xyz1 @ m.T)[:, :3]
    l, h, w = dims[:, 0], dims[:, 1], dims[:, 2]
    yaw = -ry - np.pi / 2
    boxes = np.stack(
        [xyz[:, 0], xyz[:, 1], xyz[:, 2], w, l, h, np.zeros_like(l), np.zeros_like(l), yaw],
        axis=1,
    ).astype(np.float32)
    return boxes


class KittiDataset:
    NumPointFeatures = 4
    CLASSES = ("Car", "Pedestrian", "Cyclist")

    def __init__(self, info_path: str, root_path: str = "", class_names=None,
                 pipeline: Optional[List[dict]] = None, tasks=None,
                 test_mode: bool = False, max_points: int = 120000, **kwargs):
        with open(info_path, "rb") as f:
            self._infos = pickle.load(f)
        self._root = root_path
        self._class_names = list(class_names or self.CLASSES)
        self.test_mode = test_mode
        self.pipeline = (
            build_pipeline(pipeline or [], tasks=tasks, max_points=max_points)
            if pipeline else []
        )

    def __len__(self):
        return len(self._infos)

    def get_sensor_data(self, idx: int):
        info = self._infos[idx]
        points = np.fromfile(info["velodyne_path"], dtype=np.float32).reshape(-1, 4)
        res = {
            "lidar": {"type": "lidar", "nsweeps": 1, "points": points,
                      "combined": points},
            "metadata": {"image_prefix": self._root, "num_point_features": 4,
                         "token": str(info.get("image_idx", idx))},
            "mode": "val" if self.test_mode else "train",
        }
        annos = info.get("annos")
        if annos is not None:
            keep = np.asarray([n != "DontCare" for n in annos["name"]])
            sub = {k: np.asarray(v)[keep] for k, v in annos.items()}
            res["lidar"]["annotations"] = {
                "boxes": camera_to_lidar_boxes(sub, info["calib"]),
                "names": sub["name"],
            }
        # skip LoadPointCloudFromFile (points already loaded)
        for stage in self.pipeline:
            if stage.__class__.__name__ == "LoadPointCloudFromFile":
                continue
            if stage.__class__.__name__ == "LoadPointCloudAnnotations":
                continue
            res, info = stage(res, info)
        return res

    def __getitem__(self, idx):
        return self.get_sensor_data(idx)

    def evaluation(self, detections, output_dir=".", **kwargs):
        from ...eval.kitti_eval import kitti_eval

        gt = []
        preds = []
        for i, info in enumerate(self._infos):
            token = str(info.get("image_idx", i))
            annos = info.get("annos", {"name": []})
            keep = np.asarray([n != "DontCare" for n in annos["name"]], bool)
            sub = {k: np.asarray(v)[keep] for k, v in annos.items()}
            g = {
                "boxes": camera_to_lidar_boxes(sub, info["calib"]) if keep.any() else np.zeros((0, 9), np.float32),
                "names": sub["name"],
            }
            # difficulty annotations -> official easy/moderate/hard bins
            if all(k in sub for k in ("bbox", "occluded", "truncated")):
                g["bbox"] = np.asarray(sub["bbox"], np.float32).reshape(-1, 4)
                g["occluded"] = np.asarray(sub["occluded"])
                g["truncated"] = np.asarray(sub["truncated"])
            gt.append(g)
            det = detections.get(token, None)
            if det is None:
                preds.append({"boxes": np.zeros((0, 9), np.float32), "names": np.asarray([]),
                              "scores": np.zeros((0,), np.float32)})
            else:
                valid = np.asarray(det["det_valid"]).astype(bool)
                labels = np.asarray(det["label_preds"])[valid]
                preds.append({
                    "boxes": np.asarray(det["box3d_lidar"])[valid],
                    "names": np.asarray([self._class_names[int(l)] for l in labels]),
                    "scores": np.asarray(det["scores"])[valid],
                })
        return kitti_eval(gt, preds, self._class_names)
