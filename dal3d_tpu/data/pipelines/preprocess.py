"""Preprocess + fixed-shape formatting pipeline stages.

``Preprocess`` mirrors det3d/datasets/pipelines/preprocess.py:29-258 (train
branch: class filter -> GT-AUG paste -> per-object noise -> flip/rot/scale ->
shuffle). ``ReformatFixedShape`` replaces the reference's Reformat +
collate_kitti (ragged voxel concat) with the TPU contract: padded points
[P_max, 5] + per-task padded GT arrays (voxelization and target assignment
happen on device inside the jitted step).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ...core import box_np_ops
from ..sampler import DataBaseSamplerV2, build_db_preprocessors
from . import augment


def _dict_select(d: dict, mask):
    for k, v in d.items():
        d[k] = v[mask]


class Preprocess:
    def __init__(self, cfg: dict, **kwargs):
        cfg = dict(cfg)
        self.mode = cfg["mode"]
        self.shuffle_points = cfg.get("shuffle_points", False)
        self.npoints = cfg.get("npoints", -1)
        if self.mode == "train":
            self.gt_rotation_noise = cfg.get("gt_rot_noise", [0.0, 0.0])
            self.gt_loc_noise_std = cfg.get("gt_loc_noise", [0.0, 0.0, 0.0])
            self.global_rotation_noise = cfg.get("global_rot_noise", [0.0, 0.0])
            self.global_scaling_noise = cfg.get("global_scale_noise", [1.0, 1.0])
            self.class_names = list(cfg["class_names"])
            self.min_points_in_gt = cfg.get("min_points_in_gt", -1)
            db_cfg = cfg.get("db_sampler", None)
            self.db_sampler: Optional[DataBaseSamplerV2] = None
            # parity: reference builds the sampler regardless of enable flag
            if db_cfg:
                db_cfg = dict(db_cfg)
                prep = build_db_preprocessors(db_cfg.get("db_prep_steps", []))
                try:
                    self.db_sampler = DataBaseSamplerV2(
                        db_cfg["db_info_path"],
                        [dict(g) for g in db_cfg.get("sample_groups", [])],
                        db_prepor=prep,
                        rate=db_cfg.get("rate", 1.0),
                    )
                except FileNotFoundError:
                    self.db_sampler = None

    def __call__(self, res: dict, info: dict):
        res["mode"] = self.mode
        points = res["lidar"]["combined"]

        if self.mode == "train":
            anno = res["lidar"]["annotations"]
            gt_dict = {
                "gt_boxes": np.asarray(anno["boxes"], np.float32).reshape(-1, 9),
                "gt_names": np.asarray(anno["names"]).reshape(-1),
            }
            if self.min_points_in_gt > 0:
                cnt = box_np_ops.points_in_rbbox(points, gt_dict["gt_boxes"]).sum(0)
                _dict_select(gt_dict, cnt >= self.min_points_in_gt)

            gt_boxes_mask = np.array(
                [n in self.class_names for n in gt_dict["gt_names"]], dtype=bool
            )

            if self.db_sampler is not None:
                sampled = self.db_sampler.sample_all(
                    res["metadata"].get("image_prefix", ""),
                    gt_dict["gt_boxes"],
                    gt_dict["gt_names"],
                    num_point_features=points.shape[1],
                )
                if sampled is not None:
                    gt_dict["gt_names"] = np.concatenate([gt_dict["gt_names"], sampled["gt_names"]])
                    gt_dict["gt_boxes"] = np.concatenate([gt_dict["gt_boxes"], sampled["gt_boxes"]])
                    gt_boxes_mask = np.concatenate([gt_boxes_mask, sampled["gt_masks"]])
                    sp = sampled["points"]
                    if sp.shape[1] < points.shape[1]:
                        sp = np.hstack([sp, np.zeros((sp.shape[0], points.shape[1] - sp.shape[1]), sp.dtype)])
                    points = np.concatenate([sp, points], axis=0)

            augment.noise_per_object(
                gt_dict["gt_boxes"], points, gt_boxes_mask,
                rotation_perturb=self.gt_rotation_noise,
                center_noise_std=self.gt_loc_noise_std,
            )
            _dict_select(gt_dict, gt_boxes_mask)
            gt_dict["gt_classes"] = np.array(
                [self.class_names.index(n) + 1 for n in gt_dict["gt_names"]], np.int32
            )
            rec: dict = {}
            gt_dict["gt_boxes"], points = augment.random_flip_both(
                gt_dict["gt_boxes"], points, record=rec
            )
            gt_dict["gt_boxes"], points = augment.global_rotation(
                gt_dict["gt_boxes"], points, rotation=self.global_rotation_noise, record=rec
            )
            gt_dict["gt_boxes"], points = augment.global_scaling_v2(
                gt_dict["gt_boxes"], points, *self.global_scaling_noise, record=rec
            )
            res["lidar"]["annotations"] = gt_dict
            # composed lidar-frame aug (flip -> rot -> scale) so the camera
            # branch can keep the camera2lidar extrinsics consistent
            A = np.eye(3, dtype=np.float64)
            if rec.get("flip_y"):
                A = np.diag([1.0, -1.0, 1.0]) @ A
            if rec.get("flip_x"):
                A = np.diag([-1.0, 1.0, 1.0]) @ A
            ang = rec.get("rotation", 0.0)
            c, s = np.cos(ang), np.sin(ang)
            A = np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]]) @ A
            A = rec.get("scale", 1.0) * A
            res["lidar"]["aug_matrix"] = A.astype(np.float32)

        if self.shuffle_points:
            np.random.shuffle(points)
        res["lidar"]["points"] = points
        return res, info


class ReformatFixedShape:
    """Produce the fixed-shape example dict the jitted steps consume.

    tasks: list of dicts (num_class, class_names) — GTs are split per task
    with task-local 1-based class ids (reference AssignTarget class mapping,
    preprocess.py:383-422); yaw limited to [-pi, pi).
    """

    def __init__(self, tasks: Sequence[dict], max_points: int = 300000, max_gt: int = 128,
                 voxelize_host: Optional[dict] = None, **kwargs):
        self.tasks = [dict(t) for t in tasks]
        self.max_points = max_points
        self.max_gt = max_gt
        names = [t["class_names"] for t in self.tasks]
        self.class_names_flat = [n for ns in names for n in ns]
        # host voxelization (native C++): ships mean-VFE voxel tensors instead
        # of relying on the on-device voxelizer (whose 43M-cell compaction is
        # the single most expensive op of the jitted step on this runtime)
        self.voxelize_host = dict(voxelize_host) if voxelize_host else None

    def __call__(self, res: dict, info: dict):
        points = res["lidar"]["points"]
        P = self.max_points
        n = min(len(points), P)
        pts = np.zeros((P, points.shape[1]), np.float32)
        pts[:n] = points[:n]
        valid = np.zeros(P, bool)
        valid[:n] = True
        example = {
            "points": pts,
            "points_valid": valid,
            "metadata": res.get("metadata", {}),
        }
        # camera branch (BEVFusion): merge the stacked multi-view arrays
        cam_batch = res.get("camera", {}).get("batch")
        if cam_batch:
            example.update(cam_batch)
        if "gt_masks_bev" in res:  # [C, Wc, Hc] -> NHWC-convention [Hc, Wc, C]
            example["gt_masks_bev"] = np.transpose(
                res["gt_masks_bev"], (2, 1, 0)
            ).astype(np.float32)

        if self.voxelize_host is not None:
            from ...native import host_ops

            vh = self.voxelize_host
            M = int(vh["max_voxel_num"])
            # opt-IN: halves the H2D voxel payload but quantizes mean
            # features to bfloat16 — parity baselines expect float32
            bf16 = bool(vh.get("bf16", False))
            feats, coords, npts = host_ops.points_to_voxel_mean(
                points[: self.max_points].astype(np.float32),
                vh["voxel_size"], vh["range"],
                int(vh["max_points_in_voxel"]), M,
                n_threads=int(vh.get("n_threads", 0)), bf16=bf16,
            )
            n = feats.shape[0]
            feat = np.zeros((M, points.shape[1]), feats.dtype)
            feat[:n] = feats
            vcoords = np.zeros((M, 3), np.int32)
            vcoords[:n] = coords
            vvalid = np.zeros((M,), bool)
            vvalid[:n] = True
            example["voxel_features"] = feat
            example["voxel_coords"] = vcoords
            example["voxel_valid"] = vvalid
            bp = vh.get("brick")
            if bp:
                # host sparse plans for the brick/banded engines — knobs must
                # match the backbone's (models/builder.host_voxelize_cfg
                # derives both from one source, scn.l0_brick_knobs)
                grid = np.round(
                    (np.asarray(vh["range"][3:]) - np.asarray(vh["range"][:3]))
                    / np.asarray(vh["voxel_size"])
                ).astype(np.int64)
                shape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))
                plans = None
                if bp.get("pyramid", True) and "widths" in bp:
                    # full plan pyramid (rulebooks + downsample plans), exact
                    # by construction: the device plan code run on host CPU
                    from ..sparse_plans import compute_sparse_plans

                    plans = compute_sparse_plans(
                        vcoords[None], vvalid[None], shape,
                        bp["widths"], bp["caps"], bool(bp.get("spatial", False)),
                        banded_knobs=bp.get("banded_knobs"),
                    )
                if plans is not None:
                    for k, v in plans.items():
                        example[k] = v[0]
                else:
                    # no CPU jax backend in this process: L0 pack plan only
                    # (native C++), deeper plans stay on device
                    lin, row, cnt = host_ops.brick_pack_plan(
                        coords, shape, int(bp["bw"]), int(bp["mb_cap"]),
                        bool(bp.get("spatial", False)),
                    )
                    rowp = np.full((M,), -1, np.int32)
                    rowp[:n] = row
                    example["brick_row"] = rowp
                    example["brick_lin"] = lin
                # NOTE: the true brick demand count is deliberately NOT
                # shipped in the example: a per-example scalar breaks
                # shard_batch (rank-0 leaves cannot carry
                # PartitionSpec('data')), and the trainer's one-shot capacity
                # report (runtime/capacity.py) measures L0 demand on device.

        if res.get("mode") == "train":
            gt = res["lidar"]["annotations"]
            boxes = gt["gt_boxes"]
            classes = gt["gt_classes"]  # global 1-based
            boxes = boxes.copy()
            boxes[:, -1] = box_np_ops.limit_period(boxes[:, -1], offset=0.5, period=2 * np.pi)
            gt_boxes_tasks, gt_classes_tasks = [], []
            flag = 0
            for t in self.tasks:
                nc = t["num_class"]
                mask = (classes > flag) & (classes <= flag + nc)
                tb = np.zeros((self.max_gt, 9), np.float32)
                tb[:, 3:6] = 1.0  # benign pad dims
                tc = np.zeros((self.max_gt,), np.int32)
                sel = np.flatnonzero(mask)[: self.max_gt]
                tb[: len(sel)] = np.nan_to_num(boxes[sel])
                tc[: len(sel)] = classes[sel] - flag  # task-local 1-based
                gt_boxes_tasks.append(tb)
                gt_classes_tasks.append(tc)
                flag += nc
            example["gt_boxes"] = gt_boxes_tasks
            example["gt_classes"] = gt_classes_tasks
        return example, info
