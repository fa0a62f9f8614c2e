"""Lyft Level-5 dataset (reference det3d/datasets/lyft/lyft.py — secondary).

Lyft shares the nuScenes info schema (the reference generates lyft infos with
the same fields); the dataset is the nuScenes loader with the Lyft class set
and no devkit eval (the reference evaluates Lyft mAP via its own kaggle-style
script; here detections export through the same submission path)."""
from __future__ import annotations

from .nuscenes import NuScenesDataset

LYFT_CLASSES = (
    "car", "truck", "bus", "emergency_vehicle", "other_vehicle",
    "motorcycle", "bicycle", "pedestrian", "animal",
)


class LyftDataset(NuScenesDataset):
    NumPointFeatures = 5

    def __init__(self, *args, class_names=None, **kwargs):
        super().__init__(*args, class_names=list(class_names or LYFT_CLASSES), **kwargs)

    def evaluation(self, detections, output_dir=".", **kwargs):
        nusc_annos = self.convert_detections_to_nusc(detections)
        import os

        from ...utils.fileio import dump

        res_path = os.path.join(output_dir, "results_lyft.json")
        dump(nusc_annos, res_path)
        return {"results": {"lyft": f"submission written to {res_path}"}}
