"""Partial-label nuScenes variant (reference det3d/datasets/nuscenes/
nuscenes_partial.py): for the partial-label / estimator experiments, only a
configured fraction of each frame's GT boxes is kept as labeled (the rest are
dropped before target assignment), simulating box-level annotation budgets."""
from __future__ import annotations

from typing import Optional

import numpy as np

from .nuscenes import NuScenesDataset


class NuScenesPartialDataset(NuScenesDataset):
    def __init__(self, *args, label_fraction: float = 0.5, partial_seed: int = 0, **kwargs):
        self.label_fraction = label_fraction
        self.partial_seed = partial_seed
        super().__init__(*args, **kwargs)

    def get_sensor_data(self, idx: int):
        info = self._nusc_infos[idx]
        if "gt_boxes" in info and self.label_fraction < 1.0:
            info = dict(info)
            n = len(info["gt_names"])
            rng = np.random.RandomState(self.partial_seed * 100003 + idx)
            keep = rng.rand(n) < self.label_fraction
            if n > 0 and not keep.any():
                keep[rng.randint(n)] = True
            info["gt_boxes"] = np.asarray(info["gt_boxes"])[keep]
            info["gt_names"] = np.asarray(info["gt_names"])[keep]
            if "gt_boxes_velocity" in info:
                info["gt_boxes_velocity"] = np.asarray(info["gt_boxes_velocity"])[keep]
            if "gt_boxes_token" in info:
                info["gt_boxes_token"] = np.asarray(info["gt_boxes_token"])[keep]
            return super().get_sensor_data(idx, info=info)
        return super().get_sensor_data(idx)
