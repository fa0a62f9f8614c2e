"""Config-driven model construction.

Maps reference-style executable-python model configs
(examples/active/cbgs_*.py ``model = dict(type="FPNVoxelNet", ...)``) onto the
flax modules plus the static bundles (VoxelConfig, TaskAnchors, Loss/Test
configs) the pure loss/predict functions need.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List

from ..core.anchors import TaskAnchors, generate_task_anchors
from ..core.box_coders import GroundBox3dCoder, build_box_coder
from ..core.target_assigner import DeviceTargetAssigner
from ..ops.voxelize import VoxelConfig
from .backbones.scn import (
    BAND_WIDTHS_DEFAULT,
    BANDED_CAPS_DEFAULT,
    BRICK_CAPS_DEFAULT,
    BRICK_WIDTHS_DEFAULT,
    DOWN_BANDS_DEFAULT,
    l0_brick_knobs,
)
from .heads.mg_head import LossConfig, TestConfig
from .registry import DETECTORS


@dataclass
class DetectorBundle:
    """Everything the train/predict steps need, built once from a config."""

    model: Any  # flax module
    voxel_cfg: VoxelConfig
    task_anchors: List[TaskAnchors]
    box_coder: GroundBox3dCoder
    assigner: DeviceTargetAssigner
    loss_cfg: LossConfig
    test_cfg: TestConfig
    num_classes: tuple
    class_names: List[str]
    max_points: int = 300000  # padded point-cloud capacity

    @property
    def num_tasks(self) -> int:
        return len(self.task_anchors)


def build_detector(cfg, train_cfg=None, test_cfg=None) -> DetectorBundle:
    """cfg: full experiment Config (with model/tasks/voxel_generator/...)."""
    model_cfg = dict(cfg.model)
    model_type = model_cfg.pop("type")

    vg = cfg.voxel_generator
    voxel_cfg = VoxelConfig(
        point_cloud_range=tuple(vg["range"]),
        voxel_size=tuple(vg["voxel_size"]),
        max_points_in_voxel=int(vg["max_points_in_voxel"]),
        max_voxel_num=int(vg["max_voxel_num"]),
    )

    tasks = [dict(t) for t in cfg.tasks]
    num_classes = tuple(int(t["num_class"]) for t in tasks)
    class_names = [n for t in tasks for n in t["class_names"]]

    box_coder = build_box_coder(dict(cfg.box_coder))

    # feature map size: grid_xy / out_size_factor, as [D=1, H, W]
    ds_factor = int(model_cfg.get("backbone", {}).get("ds_factor", 8))
    nx, ny, _ = voxel_cfg.grid_size
    feature_map_size = [1, ny // ds_factor, nx // ds_factor]
    task_anchors = generate_task_anchors(
        cfg.target_assigner["anchor_generators"], tasks, feature_map_size
    )
    assigner = DeviceTargetAssigner(task_anchors, box_coder)

    head_cfg = model_cfg.get("bbox_head", {})
    loss_cls = head_cfg.get("loss_cls", {})
    loss_bbox = head_cfg.get("loss_bbox", {})
    loss_norm = head_cfg.get("loss_norm", {})
    # reference LossNormType names (mg_head.py:535-578) -> losses.py ids
    norm_map = {
        "NormByNumPositives": "norm_by_num_positives",
        "NormByNumExamples": "norm_by_num_examples",
        "NormByNumPosNeg": "norm_by_num_pos_neg",
        "DontNorm": "dont_norm",
    }
    loss_cfg = LossConfig(
        pos_cls_weight=float(loss_norm.get("pos_cls_weight", 1.0)),
        neg_cls_weight=float(loss_norm.get("neg_cls_weight", 1.0)),
        loss_norm_type=norm_map[loss_norm.get("type", "NormByNumPositives")],
        focal_gamma=float(loss_cls.get("gamma", 2.0)),
        focal_alpha=float(loss_cls.get("alpha", 0.25)),
        cls_loss_weight=float(loss_cls.get("loss_weight", 1.0)),
        loc_loss_weight=float(loss_bbox.get("loss_weight", 1.0)),
        smooth_l1_sigma=float(loss_bbox.get("sigma", 3.0)),
        code_weights=tuple(loss_bbox.get("code_weights", (1.0,) * box_coder.code_size)),
        encode_rad_error_by_sin=bool(head_cfg.get("encode_rad_error_by_sin", False)),
    )

    tcfg = dict(test_cfg or cfg.get("test_cfg", {}) or {})
    nms = dict(tcfg.get("nms", {}))
    test_cfg_b = TestConfig(
        nms_pre_max_size=int(nms.get("nms_pre_max_size", 1000)),
        nms_post_max_size=int(nms.get("nms_post_max_size", 83)),
        nms_iou_threshold=float(nms.get("nms_iou_threshold", 0.2)),
        score_threshold=float(tcfg.get("score_threshold", 0.1)),
        post_center_limit_range=tuple(
            tcfg.get("post_center_limit_range", (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0))
        ),
        max_per_img=int(tcfg.get("max_per_img", 500)),
        use_rotate_nms=bool(nms.get("use_rotate_nms", True)),
        use_approx_topk=bool(nms.get("use_approx_topk", True)),
    )

    det_cls = DETECTORS.get(model_type)
    if det_cls is None:
        raise KeyError(f"unknown detector: {model_type}")
    backbone_cfg = model_cfg.get("backbone", {})
    reader_cfg = model_cfg.get("reader", {})
    neck_cfg = model_cfg.get("neck", {}) or {}
    model = det_cls(
        voxel_cfg=voxel_cfg,
        num_classes=num_classes,
        code_size=box_coder.code_size,
        num_input_features=int(reader_cfg.get("num_input_features", 5)),
        voxel_caps=tuple(backbone_cfg.get("voxel_caps", (60000, 60000, 30000, 30000))),
        rpn_layer_nums=tuple(neck_cfg.get("layer_nums", (5, 5))),
        rpn_ds_strides=tuple(neck_cfg.get("ds_layer_strides", (1, 2))),
        rpn_ds_filters=tuple(neck_cfg.get("ds_num_filters", (128, 256))),
        rpn_us_strides=tuple(neck_cfg.get("us_layer_strides", (1, 2))),
        rpn_us_filters=tuple(neck_cfg.get("us_num_filters", (256, 256))),
        backbone_impl=str(backbone_cfg.get("impl", "gather")),
        backbone_dtype=str(backbone_cfg.get("dtype", "float32")),
        brick_widths=tuple(backbone_cfg.get("brick_widths", BRICK_WIDTHS_DEFAULT)),
        brick_caps=tuple(backbone_cfg.get("brick_caps", BRICK_CAPS_DEFAULT)),
        band_widths=tuple(backbone_cfg.get("band_widths", BAND_WIDTHS_DEFAULT)),
        down_bands=tuple(backbone_cfg.get("down_bands", DOWN_BANDS_DEFAULT)),
        band_fb_cap=int(backbone_cfg.get("band_fb_cap", 256)),
        banded_caps=tuple(backbone_cfg.get("banded_caps", BANDED_CAPS_DEFAULT)),
    )

    return DetectorBundle(
        model=model,
        voxel_cfg=voxel_cfg,
        task_anchors=task_anchors,
        box_coder=box_coder,
        assigner=assigner,
        loss_cfg=loss_cfg,
        test_cfg=test_cfg_b,
        num_classes=num_classes,
        class_names=class_names,
        max_points=int(cfg.get("max_points", 300000)),
    )


def host_voxelize_cfg(cfg):
    """voxelize_host dict for the data pipeline, or None if disabled.

    Beyond the voxel_generator knobs this derives the host brick-pack plan
    sub-dict (native host_ops.brick_pack_plan) from the model's L0 engine
    config so the loader ships per-voxel brick rows alongside the voxels —
    the brick/banded backbones then skip their on-device pack compaction
    (ops/sparse_brick.from_voxels_planned)."""
    if not cfg.get("voxelize_host", True):
        return None
    vh = dict(cfg.voxel_generator)
    b = (cfg.get("model", {}) or {}).get("backbone", {}) or {}
    if "brick" not in vh:
        W = int(round((vh["range"][3] - vh["range"][0]) / vh["voxel_size"][0]))
        knobs = l0_brick_knobs(b, W)  # single source with the backbone
        if knobs:
            vh["brick"] = knobs
    return vh


def loader_voxelize_cfg(cfg):
    """voxelize_host for loader-fed passes (pool scoring, eval, training).

    Host sparse plans trade ~147 ms/frame of host CPU (data/sparse_plans.py,
    measured round 4) for ~13 ms/frame of device time (20.6 vs 16.25 scans/s
    predict) — they only WIN when the loader has cores to amortize the build
    across prefetch threads. On a core-starved host they strangle the loader
    instead: measured 1.27 scans/s sustained pool scoring on the 1-core
    build box vs ~16 scans/s with device-side plans. PLAN_HOST=1/0 forces
    host/device plans; the default (auto) ships host plans only when the
    process has >= 4 usable cores."""
    import os

    vh = host_voxelize_cfg(cfg)
    if vh is None or "brick" not in vh:
        return vh
    mode = os.environ.get("PLAN_HOST", "auto")
    if mode == "1":
        return vh
    if mode not in ("0", "device"):
        try:
            cores = len(os.sched_getaffinity(0))
        except AttributeError:  # pragma: no cover - non-linux
            cores = os.cpu_count() or 1
        if cores >= 4:
            return vh
    vh = dict(vh)
    del vh["brick"]
    return vh


def build_host_brick_plan(vc, vv, sparse_shape, bp):
    """Batched host brick-pack plan: (brick_row [B, M], brick_lin [B, cap])
    numpy arrays from host voxel coords in valid-first layout. ``bp`` is the
    {bw, mb_cap, spatial} dict from host_voxelize_cfg; ``sparse_shape`` MUST
    be the model's voxel_cfg.sparse_shape (a mismatched shape linearizes
    cells wrong with no error). Shared by bench.py and the profilers; the
    data pipeline computes the same per-example (pipelines/preprocess.py)."""
    import numpy as np

    from ..native import host_ops

    B, M = vv.shape
    shape = tuple(int(s) for s in sparse_shape)
    rows = np.full((B, M), -1, np.int32)
    lins = np.zeros((B, bp["mb_cap"]), np.int32)
    for b in range(B):
        nvb = int(vv[b].sum())
        lin, r, _ = host_ops.brick_pack_plan(
            vc[b, :nvb], shape, bp["bw"], bp["mb_cap"], bp["spatial"])
        rows[b, :nvb] = r
        lins[b] = lin
    return rows, lins


def build_host_sparse_plans(vc, vv, sparse_shape, bp):
    """Full host plan pyramid as a dict of batched numpy arrays
    (ops/sparse_brick.HOST_PLAN_KEYS). Falls back to the L0-only C++ plan
    when the process has no CPU jax backend."""
    if bp.get("pyramid", True) and "widths" in bp:
        from ..data.sparse_plans import compute_sparse_plans

        plans = compute_sparse_plans(vc, vv, sparse_shape, bp["widths"],
                                     bp["caps"], bp["spatial"],
                                     banded_knobs=bp.get("banded_knobs"))
        if plans is not None:
            return plans
    rows, lins = build_host_brick_plan(vc, vv, sparse_shape, bp)
    return {"brick_row": rows, "brick_lin": lins}


def eval_test_cfg(cfg, logger=None) -> dict:
    """Metric-eval test_cfg: default to the EXACT top-k prefilter so reported
    mAP is reproducible against the reference decode; production/bench
    configs opt back into approx_max_k (~0.95 recall) explicitly (ADVICE r2).
    Shared by tools/test.py and tools/dist_test.py."""
    tcfg = dict(cfg.get("test_cfg", {}) or {})
    nms = dict(tcfg.get("nms", {}))
    nms.setdefault("use_approx_topk", False)
    tcfg["nms"] = nms
    if logger is not None:
        logger.info(f"top-k prefilter: {'approx' if nms['use_approx_topk'] else 'exact'}")
    return tcfg
