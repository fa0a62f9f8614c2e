"""Lyft Level-5 dataset (reference det3d/datasets/lyft/lyft.py).

Lyft shares the nuScenes info schema (the reference generates lyft infos with
the same fields); the dataset is the nuScenes loader with the Lyft class set.
Evaluation computes the kaggle Lyft score (eval/lyft_eval.py — the working
replacement for the reference's pdb-wedged det3d/datasets/lyft/eval.py)
against the infos' GT when present, and always writes the submission json."""
from __future__ import annotations

import numpy as np

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
        import os

        from ...eval.lyft_eval import lyft_eval
        from ...utils.fileio import dump

        nusc_annos = self.convert_detections_to_nusc(detections)
        res_path = os.path.join(output_dir, "results_lyft.json")
        dump(nusc_annos, res_path)

        results = {"lyft": f"submission written to {res_path}"}
        if all("gt_boxes" in info for info in self._nusc_infos):
            gt_frames, pred_frames = [], []
            for info in self._nusc_infos:
                det = detections.get(info["token"])
                if det is None:
                    continue
                gt_frames.append({
                    "boxes": np.asarray(info["gt_boxes"]),
                    "names": np.asarray(info["gt_names"]),
                })
                valid = np.asarray(det.get("det_valid", np.ones(len(det["scores"]), bool)))
                labels = np.asarray(det["label_preds"])[valid]
                pred_frames.append({
                    "boxes": np.asarray(det["box3d_lidar"])[valid],
                    "names": np.asarray([self._class_names[i] for i in labels]),
                    "scores": np.asarray(det["scores"])[valid],
                })
            if gt_frames:
                results.update(lyft_eval(gt_frames, pred_frames, self._class_names))
        return {"results": results}
