"""Numpy-only pieces of the torch parity oracle, shared by
tests/test_convert_second.py (full torch replica) and the committed golden
fixture (tests/test_golden_fixture.py + tools/make_golden_fixture.py) —
split out so the fixture test can regenerate the seeded reference
state_dict WITHOUT torch installed.

The state_dict schema is the reference CBGS VoxelNet's det3d naming
(backbone scn.py:331-369, neck rpn.py:67-141, head mg_head.py:199-226) at
the small oracle scale from test_convert_second.py.
"""
import numpy as np

from dal3d_tpu.ops.voxelize import VoxelConfig

# grid 16x16x40 -> sparse shape (41, 16, 16); depth chain 41-21-11-5-2
VCFG = VoxelConfig(
    point_cloud_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 1.0),
    voxel_size=(1.0, 1.0, 0.1),
    max_points_in_voxel=5,
    max_voxel_num=41 * 16 * 16,
)
NUM_CLASSES = (1, 2)
LAYER_NUMS, DS_STRIDES = (5, 5), (1, 2)
DS_FILTERS, US_STRIDES, US_FILTERS = (32, 64), (1, 2), (64, 64)
CODE_SIZE = 10


def rnd_state_dict(rng, normalized: bool = False):
    """Random det3d-named CBGS VoxelNet state_dict (numpy).

    normalized=True draws every conv at 1/sqrt(fan_in) scale so activations
    stay O(1) through the 20-layer stack — required when the DECODED boxes
    must be finite/meaningful (the golden predict fixture); the default 0.15
    scale (gain ~3/layer, activations ~1e9 at the head) is kept for the raw
    forward-parity oracle, where only relative error matters.
    """
    sd = {}

    def _cscale(fan_in):
        return float(1.0 / np.sqrt(fan_in)) if normalized else 0.15

    def conv3d(name, k, ci, co, bias):
        kd, kh, kw = k if isinstance(k, tuple) else (k, k, k)
        sd[f"{name}.weight"] = (rng.randn(kd, kh, kw, ci, co).astype(np.float32)
                                * _cscale(kd * kh * kw * ci))
        if bias:
            sd[f"{name}.bias"] = rng.randn(co).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = (1 + 0.2 * rng.randn(c)).astype(np.float32)
        sd[f"{name}.bias"] = (0.1 * rng.randn(c)).astype(np.float32)
        sd[f"{name}.running_mean"] = (0.1 * rng.randn(c)).astype(np.float32)
        sd[f"{name}.running_var"] = (1 + 0.1 * rng.rand(c)).astype(np.float32)

    def block(name, c):
        conv3d(f"{name}.conv1", 3, c, c, True)
        bn(f"{name}.bn1", c)
        conv3d(f"{name}.conv2", 3, c, c, True)
        bn(f"{name}.bn2", c)

    # backbone (FPN variant, scn.py:331-369)
    conv3d("backbone.middle_conv0.0", 3, 5, 16, False)
    bn("backbone.middle_conv0.1", 16)
    block("backbone.middle_conv0.3", 16)
    block("backbone.middle_conv0.4", 16)
    conv3d("backbone.middle_conv0.5", 3, 16, 32, False)
    bn("backbone.middle_conv0.6", 32)
    for i, (ci, co) in enumerate([(32, 64), (64, 128), (128, 128)], start=1):
        block(f"backbone.middle_conv{i}.0", ci)
        block(f"backbone.middle_conv{i}.1", ci)
        conv3d(f"backbone.middle_conv{i}.2", (3, 1, 1) if i == 3 else 3, ci, co, False)
        bn(f"backbone.middle_conv{i}.3", co)

    # RPN (rpn.py:67-141): blocks.{b}.(1,4,7,...) convs / (2,5,8,...) BNs
    cin = 256
    for b, (ln, planes) in enumerate(zip(LAYER_NUMS, DS_FILTERS)):
        for j in range(ln + 1):
            seq = 1 + 3 * j
            ci = cin if j == 0 else planes
            sd[f"neck.blocks.{b}.{seq}.weight"] = (
                rng.randn(planes, ci, 3, 3).astype(np.float32)
                * (float(1.0 / np.sqrt(9 * ci)) if normalized else 0.1))
            bn(f"neck.blocks.{b}.{seq + 1}", planes)
        cin = planes
        us, uf = US_STRIDES[b], US_FILTERS[b]
        if us > 1:  # ConvTranspose2d [Cin, Cout, k, k]
            sd[f"neck.deblocks.{b}.0.weight"] = (
                rng.randn(planes, uf, us, us).astype(np.float32)
                * (float(1.0 / np.sqrt(planes)) if normalized else 0.1))
        else:  # Conv2d kernel=stride=1
            sd[f"neck.deblocks.{b}.0.weight"] = (
                rng.randn(uf, planes, 1, 1).astype(np.float32)
                * (float(1.0 / np.sqrt(planes)) if normalized else 0.1))
        bn(f"neck.deblocks.{b}.1", uf)

    # head (mg_head.py:199-226)
    for t, nc in enumerate(NUM_CLASSES):
        na = nc * 2
        sd[f"bbox_head.tasks.{t}.conv_box.weight"] = (
            rng.randn(na * CODE_SIZE, 128, 1, 1).astype(np.float32)
            * (float(1.0 / np.sqrt(128)) if normalized else 0.1))
        sd[f"bbox_head.tasks.{t}.conv_box.bias"] = (
            rng.randn(na * CODE_SIZE).astype(np.float32) * 0.05)
        sd[f"bbox_head.tasks.{t}.conv_cls.weight"] = (
            rng.randn(na * nc, 128, 1, 1).astype(np.float32)
            * (float(1.0 / np.sqrt(128)) if normalized else 0.1))
        sd[f"bbox_head.tasks.{t}.conv_cls.bias"] = (
            rng.randn(na * nc).astype(np.float32) * 0.05)
    return sd


def dense_voxels(rng):
    """Fully-dense voxel grid (subm sparse conv == dense conv3d there)."""
    D, H, W = VCFG.sparse_shape
    coords = np.stack(np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                                  indexing="ij"), -1).reshape(-1, 3)
    feats = rng.randn(len(coords), 5).astype(np.float32)
    dense = np.zeros((1, 5, D, H, W), np.float32)
    dense[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    return feats[None], coords[None].astype(np.int32), np.ones((1, len(coords)), bool), dense


def build_oracle_model(impl: str = "gather"):
    """The jax twin at the oracle scale (matches rnd_state_dict's schema)."""
    from dal3d_tpu.models import FPNVoxelNet

    return FPNVoxelNet(
        voxel_cfg=VCFG, num_classes=NUM_CLASSES, voxel_caps=(2048, 1024, 512, 512),
        rpn_layer_nums=LAYER_NUMS, rpn_ds_strides=DS_STRIDES, rpn_ds_filters=DS_FILTERS,
        rpn_us_strides=US_STRIDES, rpn_us_filters=US_FILTERS,
        backbone_impl=impl,
        brick_widths=(16, 8, 4, 2, 2),
        banded_caps=(12032, 2048, 512, 256, 256),
        band_widths=(512, 256, 128, 128, 128), down_bands=(512, 256, 128, 128),
        band_fb_cap=128,
    )


GOLDEN_CLASS_NAMES = ["car", "pedestrian", "traffic_cone"]


def golden_predict_setup():
    """Anchors/coder/test-config of the committed golden fixture — shared by
    tools/make_golden_fixture.py (generation, torch present) and
    tests/test_golden_fixture.py (assertion, torch-free) so both sides decode
    the oracle model's 2x2 BEV map identically."""
    from dal3d_tpu.core.anchors import generate_task_anchors
    from dal3d_tpu.core.box_coders import GroundBox3dCoder
    from dal3d_tpu.models.heads.mg_head import TestConfig

    _a = dict(type="anchor_generator_range", rotations=[0, 1.57],
              velocities=[0, 0])
    gens = [
        dict(**_a, sizes=[1.97, 4.63, 1.74],
             anchor_ranges=[-8, -8, -0.95, 8, 8, -0.95],
             matched_threshold=0.6, unmatched_threshold=0.45, class_name="car"),
        dict(**_a, sizes=[0.67, 0.73, 1.77],
             anchor_ranges=[-8, -8, -0.935, 8, 8, -0.935],
             matched_threshold=0.35, unmatched_threshold=0.2,
             class_name="pedestrian"),
        dict(**_a, sizes=[0.41, 0.41, 1.07],
             anchor_ranges=[-8, -8, -1.285, 8, 8, -1.285],
             matched_threshold=0.35, unmatched_threshold=0.2,
             class_name="traffic_cone"),
    ]
    tasks = [dict(num_class=1, class_names=["car"]),
             dict(num_class=2, class_names=["pedestrian", "traffic_cone"])]
    task_anchors = generate_task_anchors(gens, tasks, [1, 2, 2])
    coder = GroundBox3dCoder(vec_encode=True, n_dim=9)
    # exact top-k + low threshold: every stage deterministic at this scale
    test_cfg = TestConfig(
        nms_pre_max_size=8, nms_post_max_size=4, nms_iou_threshold=0.2,
        score_threshold=0.05, use_approx_topk=False,
        post_center_limit_range=(-20.0, -20.0, -10.0, 20.0, 20.0, 10.0),
    )
    return task_anchors, coder, test_cfg
