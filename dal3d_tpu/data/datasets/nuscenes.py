"""nuScenes dataset (infos-pkl driven) with CBGS class-balanced resampling.

Parity with det3d/datasets/nuscenes/nuscenes.py:29-320:
- load_infos (:68-103): at train time, resample frames per class with ratio
  (1/num_classes) / class_frequency (CBGS), keeping ``frac = 0.25 * len`` for
  ``reset()``,
- get_sensor_data (:152): run the pipeline over the info dict,
- evaluation (:181-320): convert padded detections to nuScenes submission
  json (yaw -> -yaw - pi/2, sensor->global transform, speed-based attributes)
  and shell into the official devkit when available (the devkit stays the
  host-side metric oracle).
"""
from __future__ import annotations

import pickle
import random
from typing import Any, Dict, List, Optional

import numpy as np

from ...utils.fileio import dump, load
from ..pipelines.loading import LoadPointCloudAnnotations, LoadPointCloudFromFile
from ..pipelines.preprocess import Preprocess, ReformatFixedShape

general_to_detection = {
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.wheelchair": "ignore",
    "human.pedestrian.stroller": "ignore",
    "human.pedestrian.personal_mobility": "ignore",
    "human.pedestrian.police_officer": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "animal": "ignore",
    "vehicle.car": "car",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.truck": "truck",
    "vehicle.construction": "construction_vehicle",
    "vehicle.emergency.ambulance": "ignore",
    "vehicle.emergency.police": "ignore",
    "vehicle.trailer": "trailer",
    "movable_object.barrier": "barrier",
    "movable_object.trafficcone": "traffic_cone",
    "movable_object.pushable_pullable": "ignore",
    "movable_object.debris": "ignore",
    "static_object.bicycle_rack": "ignore",
}


def build_pipeline(pipeline_cfgs: List[dict], tasks=None, max_points=300000,
                   voxelize_host=None):
    stages = []
    for cfg in pipeline_cfgs:
        cfg = dict(cfg)
        t = cfg.pop("type")
        if t == "LoadPointCloudFromFile":
            stages.append(LoadPointCloudFromFile(**cfg))
        elif t == "LoadPointCloudAnnotations":
            stages.append(LoadPointCloudAnnotations(**cfg))
        elif t == "Preprocess":
            stages.append(Preprocess(cfg["cfg"]))
        elif t in ("Reformat", "ReformatFixedShape"):
            cfg.setdefault("voxelize_host", voxelize_host)
            stages.append(ReformatFixedShape(tasks=tasks, max_points=max_points, **cfg))
        elif t in ("Voxelization", "AssignTarget"):
            # on-device in this framework (ops.voxelize / core.target_assigner)
            continue
        elif t in ("LoadMultiViewImages", "LoadMultiViewImageFromFiles"):
            from ..pipelines.camera import LoadMultiViewImages

            stages.append(LoadMultiViewImages(**cfg))
        elif t == "LoadBEVSegmentation":
            from ..pipelines.bev_seg import LoadBEVSegmentation

            stages.append(LoadBEVSegmentation(**cfg))
        elif t == "ImageAug3D":
            from ..pipelines.camera import ImageAug3D

            cfg.pop("is_train", None)  # train/val picked from res["mode"]
            stages.append(ImageAug3D(**cfg))
        elif t == "GridMask":
            from ..pipelines.camera import GridMask

            cfg = {k: v for k, v in cfg.items()
                   if k in ("prob", "ratio", "rotate", "use_h", "use_w", "mode")}
            stages.append(GridMask(**cfg))
        elif t == "ImageNormalize":
            from ..pipelines.camera import ImageNormalize

            stages.append(ImageNormalize(**cfg))
        elif t == "ReformatCamera":
            from ..pipelines.camera import ReformatCamera

            stages.append(ReformatCamera(**cfg))
        elif t in ("FrameDropout", "PointSample", "BackgroundPointsFilter",
                   "VoxelBasedPointSampler", "ImagePad", "ImageDistort",
                   "PhotoMetricDistortionMultiViewImage", "GlobalRotScaleTrans",
                   "RandomFlip3D", "ObjectPaste", "ObjectNoise", "PointShuffle",
                   "ObjectRangeFilter", "PointsRangeFilter", "ObjectNameFilter"):
            from ..pipelines import transforms_extra as tx

            cls = {
                "FrameDropout": tx.FrameDropout,
                "PointSample": tx.PointSample,
                "BackgroundPointsFilter": tx.BackgroundPointsFilter,
                "VoxelBasedPointSampler": tx.VoxelBasedPointSampler,
                "ImagePad": tx.ImagePad,
                "ImageDistort": tx.ImageDistort,
                "PhotoMetricDistortionMultiViewImage": tx.ImageDistort,
                "GlobalRotScaleTrans": tx.GlobalRotScaleTrans,
                "RandomFlip3D": tx.RandomFlip3D,
                "ObjectPaste": tx.ObjectPaste,
                "ObjectNoise": tx.ObjectNoise,
                "PointShuffle": tx.PointShuffle,
                "ObjectRangeFilter": tx.ObjectRangeFilter,
                "PointsRangeFilter": tx.PointsRangeFilter,
                "ObjectNameFilter": tx.ObjectNameFilter,
            }[t]
            cfg.pop("is_train", None)  # train/val picked from res["mode"]
            stages.append(cls(**cfg))
        else:
            raise KeyError(f"unknown pipeline stage {t}")
    # val-mode sweep-read cap: when every stage between the lidar load and the
    # fixed-shape reformat preserves point order (no shuffle/subsample), the
    # reformat keeps the first max_points rows — so reading past the cap is
    # wasted IO. Only the whitelisted stage set below is provably
    # order-preserving in val mode; anything else disables the cap.
    _order_preserving = (LoadPointCloudFromFile, LoadPointCloudAnnotations,
                         ReformatFixedShape)
    safe = all(
        isinstance(s, _order_preserving)
        or (isinstance(s, Preprocess) and not s.shuffle_points)
        or type(s).__name__ in ("LoadMultiViewImages", "ImageAug3D", "GridMask",
                                "ImageNormalize", "ImagePad", "ReformatCamera",
                                "LoadBEVSegmentation")
        for s in stages
    )
    if safe:
        for s in stages:
            if isinstance(s, LoadPointCloudFromFile):
                s.max_points = max_points
    return stages


class NuScenesDataset:
    NumPointFeatures = 5

    def __init__(
        self,
        info_path: str,
        root_path: str = "",
        nsweeps: int = 10,
        class_names: Optional[List[str]] = None,
        pipeline: Optional[List[dict]] = None,
        tasks: Optional[List[dict]] = None,
        test_mode: bool = False,
        max_points: int = 300000,
        version: str = "v1.0-trainval",
        voxelize_host=None,
        **kwargs,
    ):
        self._info_path = info_path
        self._root_path = root_path
        self.nsweeps = nsweeps
        assert self.nsweeps > 0, "At least input one sweep please!"
        self._class_names = list(class_names or [])
        self.test_mode = test_mode
        self.version = version
        self.eval_version = "detection_cvpr_2019"
        self.load_infos(info_path)
        self.pipeline = (
            build_pipeline(pipeline or [], tasks=tasks, max_points=max_points,
                           voxelize_host=voxelize_host)
            if pipeline else []
        )

    # ------------------------------------------------------------------
    def load_infos(self, info_path: str):
        """Load infos; in train mode apply CBGS class-balanced resampling.

        CBGS semantics (reference det3d/datasets/nuscenes/nuscenes.py:68-103):
        every frame is listed once per distinct class it contains, and each
        class's frame list is then resampled so all classes contribute an
        equal share (1/num_classes) of the epoch — rare-class frames get
        duplicated, common-class frames get subsampled.
        """
        with open(info_path, "rb") as f:
            all_infos = pickle.load(f)
        self._set_infos(all_infos)

    def _set_infos(self, all_infos):
        """Install ``all_infos`` as the epoch pool: flatten at test time,
        CBGS-resample at train time (shared with NuScenesPartialDataset,
        whose load_infos subsets the pool by the AL buffer first)."""
        self._nusc_infos_all = all_infos
        if self.test_mode:
            # eval infos may be stored as a dict of splits
            self._nusc_infos = (
                [i for v in all_infos.values() for i in v]
                if isinstance(all_infos, dict) else list(all_infos)
            )
            return
        self.frac = int(len(all_infos) * 0.25)  # reserve for reset()
        per_class = {name: [] for name in self._class_names}
        for info in all_infos:
            for name in set(info["gt_names"]) & set(self._class_names):
                per_class[name].append(info)
        total = sum(len(v) for v in per_class.values())
        if total == 0:  # no labels at all (e.g. unlabeled pool): keep as-is
            self._nusc_infos = list(all_infos)
            return
        target_share = 1.0 / len(self._class_names)
        resampled = []
        for frames in per_class.values():
            share = len(frames) / total
            if share > 0:
                take = int(len(frames) * target_share / share)
                resampled += np.random.choice(frames, take).tolist()
        self._nusc_infos = resampled

    def reset(self):
        random.shuffle(self._nusc_infos_all)
        self._nusc_infos = self._nusc_infos_all[: self.frac]

    @property
    def infos(self) -> List[dict]:
        return self._nusc_infos

    @property
    def class_names(self) -> List[str]:
        return self._class_names

    def __len__(self):
        return len(self._nusc_infos)

    # ------------------------------------------------------------------
    def get_sensor_data(self, idx: int, info: Optional[dict] = None) -> Dict[str, Any]:
        """Run the pipeline for frame ``idx``; ``info`` overrides the stored
        info dict (lets subclasses pass a modified copy without mutating
        shared state — safe under multi-worker loaders)."""
        if info is None:
            info = self._nusc_infos[idx]
        res = {
            "lidar": {"type": "lidar", "points": None, "nsweeps": self.nsweeps},
            "metadata": {
                "image_prefix": self._root_path,
                "num_point_features": self.NumPointFeatures,
                "token": info["token"],
            },
            "mode": "val" if self.test_mode else "train",
        }
        for stage in self.pipeline:
            res, info = stage(res, info)
        return res

    def __getitem__(self, idx: int):
        return self.get_sensor_data(idx)

    # ------------------------------------------------------------------
    def convert_detections_to_nusc(self, detections: Dict[str, dict]) -> dict:
        """Padded device detections -> nuScenes submission dict
        (reference nuscenes.py:181-320 + nusc_common.py:222-266)."""
        from .nusc_eval import detections_to_nusc_boxes

        nusc_annos = {"results": {}, "meta": {
            "use_camera": False, "use_lidar": True, "use_radar": False,
            "use_map": False, "use_external": False,
        }}
        token_to_info = {i["token"]: i for i in self._nusc_infos}
        for token, det in detections.items():
            info = token_to_info[token]
            nusc_annos["results"][token] = detections_to_nusc_boxes(
                det, info, self._class_names
            )
        return nusc_annos

    def evaluation(self, detections: Dict[str, dict], output_dir: str = ".", testset=False):
        """Write submission json; run the official devkit if importable."""
        import os

        nusc_annos = self.convert_detections_to_nusc(detections)
        res_path = os.path.join(output_dir, "results_nusc.json")
        dump(nusc_annos, res_path)
        try:
            from .nusc_eval import eval_main

            return eval_main(res_path, self._root_path, self.version, self.eval_version, output_dir)
        except ImportError:
            return {"results": {"nusc": f"submission written to {res_path} (devkit unavailable)"}}
