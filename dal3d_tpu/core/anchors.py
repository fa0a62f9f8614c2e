"""Anchor generation for the CBGS multi-task head.

Re-design of AnchorGeneratorRange + TargetAssigner.generate_anchors
(reference: det3d/core/anchor/anchor_generator.py:64, target_assigner.py:144-187):
the anchor grid is static per config, so it is built once on host (numpy) and
constant-folded into the jitted train/predict steps.

Per-task layout (parity-critical): anchors [D*H*W, num_classes_in_task *
num_rot, ndim] flattened row-major — the same (H, W, class, rot) interleaving
the reference produces by concatenating per-class grids at axis=-2.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np

from . import box_np_ops


@dataclass
class AnchorGeneratorRange:
    anchor_ranges: Sequence[float]
    sizes: Sequence[float] = (1.6, 3.9, 1.56)
    rotations: Sequence[float] = (0.0, np.pi / 2)
    velocities: Sequence[float] | None = None
    class_name: str | None = None
    match_threshold: float = -1.0
    unmatch_threshold: float = -1.0
    dtype: type = np.float32

    @property
    def num_anchors_per_localization(self) -> int:
        num_rot = len(self.rotations)
        num_size = np.array(self.sizes).reshape([-1, 3]).shape[0]
        return num_rot * num_size

    def generate(self, feature_map_size) -> np.ndarray:
        """feature_map_size [D, H, W] -> [D, H, W, num_size*num_rot, ndim]."""
        anchors = box_np_ops.create_anchors_3d_range(
            feature_map_size,
            self.anchor_ranges,
            self.sizes,
            self.rotations,
            self.velocities,
            self.dtype,
        )
        return anchors.reshape([*anchors.shape[:3], -1, anchors.shape[-1]])


def build_anchor_generator(cfg: dict) -> AnchorGeneratorRange:
    cfg = dict(cfg)
    t = cfg.pop("type", "anchor_generator_range")
    if t not in ("anchor_generator_range", "AnchorGeneratorRange"):
        raise ValueError(f"unknown anchor generator: {t}")
    return AnchorGeneratorRange(
        anchor_ranges=cfg["anchor_ranges"],
        sizes=cfg["sizes"],
        rotations=cfg.get("rotations", (0.0, np.pi / 2)),
        velocities=cfg.get("velocities", None),
        class_name=cfg.get("class_name"),
        match_threshold=cfg.get("matched_threshold", -1.0),
        unmatch_threshold=cfg.get("unmatched_threshold", -1.0),
    )


@dataclass
class TaskAnchors:
    """Static per-task anchor bundle consumed by head loss / predict."""

    class_names: List[str]
    # [A, ndim] flattened (D,H,W, class*rot) order
    anchors: np.ndarray
    # per-class stacked [C, A_c, ndim] where A_c = D*H*W*num_rot (assignment view)
    anchors_by_class: np.ndarray
    matched_thresholds: np.ndarray  # [C]
    unmatched_thresholds: np.ndarray  # [C]
    feature_map_size: tuple  # (D, H, W)
    num_rot: int = 2

    @property
    def num_classes(self) -> int:
        return len(self.class_names)

    @property
    def num_anchors_per_loc(self) -> int:
        return self.num_classes * self.num_rot


def generate_task_anchors(
    anchor_generator_cfgs: Sequence[dict],
    tasks: Sequence[dict],
    feature_map_size: Sequence[int],
) -> List[TaskAnchors]:
    """Build the per-task anchor bundles from the flat generator list.

    The flat generator list is split across tasks by each task's num_class
    (reference: det3d/datasets/pipelines/preprocess.py:326-340).
    """
    gens = [build_anchor_generator(c) for c in anchor_generator_cfgs]
    out: List[TaskAnchors] = []
    flag = 0
    for task in tasks:
        n = task["num_class"]
        task_gens = gens[flag : flag + n]
        flag += n
        per_class = []  # each [D, H, W, num_rot, ndim]
        match_t, unmatch_t = [], []
        for g in task_gens:
            a = g.generate(feature_map_size)  # [D,H,W,num_loc,ndim]
            per_class.append(a)
            match_t.append(g.match_threshold)
            unmatch_t.append(g.unmatch_threshold)
        # interleave per-class at the per-location dim: [D,H,W, C*num_rot, ndim]
        interleaved = np.concatenate(per_class, axis=-2)
        flat = interleaved.reshape(-1, interleaved.shape[-1])
        by_class = np.stack([a.reshape(-1, a.shape[-1]) for a in per_class])  # [C, A_c, ndim]
        out.append(
            TaskAnchors(
                class_names=list(task["class_names"]),
                anchors=flat.astype(np.float32),
                anchors_by_class=by_class.astype(np.float32),
                matched_thresholds=np.asarray(match_t, np.float32),
                unmatched_thresholds=np.asarray(unmatch_t, np.float32),
                feature_map_size=tuple(feature_map_size),
                num_rot=len(task_gens[0].rotations),
            )
        )
    return out
