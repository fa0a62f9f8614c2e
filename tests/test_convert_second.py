"""Reference-checkpoint converter parity: a det3d-named torch state_dict is
converted to flax variables and our FPNVoxelNet forward must match a torch
replica of the reference math (scn.py + rpn.py + mg_head.py) bit-for-bit
(f32 tolerance).

Oracle trick: on a FULLY-DENSE voxel grid, submanifold sparse conv equals
dense conv3d (every site active; outside-grid contributions are zero either
way), and spconv's strided SparseConv3d equals strided dense conv3d — so the
whole reference backbone collapses to plain torch Conv3d/BatchNorm/ReLU in
eval mode. That makes the torch side an executable record of the reference's
numerics without needing spconv/CUDA, and any kernel-tap flip or transpose
mistake in the converter fails loudly.

What a REAL-data parity run still needs (not possible in this env): a trained
reference .pth + nuScenes val to compare mAP/NDS end-to-end; this test proves
the weight mapping and forward math agree, i.e. parity up to data.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from dal3d_tpu.models import FPNVoxelNet  # noqa: E402
from dal3d_tpu.models.convert_second import (  # noqa: E402
    convert_second_state_dict,
    flatten_tree,
)

from oracle_utils import (  # noqa: E402
    CODE_SIZE, DS_FILTERS, DS_STRIDES, LAYER_NUMS, NUM_CLASSES, US_FILTERS,
    US_STRIDES, VCFG, dense_voxels as _dense_voxels,
    rnd_state_dict as _rnd_state_dict,
)


def _t_bn(x, sd, p, eps=1e-3):
    return F.batch_norm(
        x, torch.as_tensor(sd[f"{p}.running_mean"]), torch.as_tensor(sd[f"{p}.running_var"]),
        torch.as_tensor(sd[f"{p}.weight"]), torch.as_tensor(sd[f"{p}.bias"]),
        training=False, eps=eps)


def _t_conv3(x, sd, p, stride=1, padding=1):
    w = torch.as_tensor(sd[f"{p}.weight"]).permute(4, 3, 0, 1, 2)  # -> [co,ci,kd,kh,kw]
    b = torch.as_tensor(sd[f"{p}.bias"]) if f"{p}.bias" in sd else None
    return F.conv3d(x, w, b, stride=stride, padding=padding)


def _t_block(x, sd, p):
    out = _t_conv3(x, sd, f"{p}.conv1")
    out = F.relu(_t_bn(out, sd, f"{p}.bn1"))
    out = _t_conv3(out, sd, f"{p}.conv2")
    out = _t_bn(out, sd, f"{p}.bn2")
    return F.relu(out + x)


def _torch_reference_forward(sd, dense_in):
    """Reference VoxelNet forward on a fully-dense grid, torch eval mode."""
    x = torch.as_tensor(dense_in)  # [1, 5, D, H, W]
    m = "backbone.middle_conv0"
    x = F.relu(_t_bn(_t_conv3(x, sd, f"{m}.0"), sd, f"{m}.1"))
    x = _t_block(x, sd, f"{m}.3")
    x = _t_block(x, sd, f"{m}.4")
    x = F.relu(_t_bn(_t_conv3(x, sd, f"{m}.5", stride=2, padding=1), sd, f"{m}.6"))
    for i, (stride, pad, ker) in enumerate(
            [(2, 1, 3), (2, (0, 1, 1), 3), ((2, 1, 1), 0, (3, 1, 1))], start=1):
        m = f"backbone.middle_conv{i}"
        x = _t_block(x, sd, f"{m}.0")
        x = _t_block(x, sd, f"{m}.1")
        x = F.relu(_t_bn(_t_conv3(x, sd, f"{m}.2", stride=stride, padding=pad), sd, f"{m}.3"))
    N, C, D, H, W = x.shape
    bev = x.reshape(N, C * D, H, W)  # channel = c*D + d (reference .view)

    ups = []
    for b, (ln, planes) in enumerate(zip(LAYER_NUMS, DS_FILTERS)):
        stride = DS_STRIDES[b]
        for j in range(ln + 1):
            seq = 1 + 3 * j
            w = torch.as_tensor(sd[f"neck.blocks.{b}.{seq}.weight"])
            bev = F.conv2d(bev, w, stride=stride if j == 0 else 1, padding=1)
            bev = F.relu(_t_bn(bev, sd, f"neck.blocks.{b}.{seq + 1}"))
        us = US_STRIDES[b]
        w = torch.as_tensor(sd[f"neck.deblocks.{b}.0.weight"])
        if us > 1:
            u = F.conv_transpose2d(bev, w, stride=us)
        else:
            u = F.conv2d(bev, w, stride=1)
        ups.append(F.relu(_t_bn(u, sd, f"neck.deblocks.{b}.1")))
    neck = torch.cat(ups, dim=1)

    preds = []
    for t, nc in enumerate(NUM_CLASSES):
        box = F.conv2d(neck, torch.as_tensor(sd[f"bbox_head.tasks.{t}.conv_box.weight"]),
                       torch.as_tensor(sd[f"bbox_head.tasks.{t}.conv_box.bias"]))
        cls = F.conv2d(neck, torch.as_tensor(sd[f"bbox_head.tasks.{t}.conv_cls.weight"]),
                       torch.as_tensor(sd[f"bbox_head.tasks.{t}.conv_cls.bias"]))
        preds.append((box.permute(0, 2, 3, 1).numpy(), cls.permute(0, 2, 3, 1).numpy()))
    return neck.permute(0, 2, 3, 1).numpy(), preds


def _dense_voxels(rng):
    D, H, W = VCFG.sparse_shape
    coords = np.stack(np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                                  indexing="ij"), -1).reshape(-1, 3)
    feats = rng.randn(len(coords), 5).astype(np.float32)
    dense = np.zeros((1, 5, D, H, W), np.float32)
    dense[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    return feats[None], coords[None].astype(np.int32), np.ones((1, len(coords)), bool), dense


def test_npz_roundtrip_and_state_init(tmp_path):
    """CLI npz format round-trips and apply_torch_init replaces every leaf of
    a freshly-created TrainState (shape-checked merge)."""
    from dal3d_tpu.models.builder import DetectorBundle  # noqa: F401
    from dal3d_tpu.models.convert_second import apply_torch_init

    rng = np.random.RandomState(1)
    sd = _rnd_state_dict(rng)
    path = str(tmp_path / "ckpt.npz")
    np.savez(path, **{k.replace(".", "__dot__"): v for k, v in sd.items()})

    vf, vc, vv, _ = _dense_voxels(rng)
    model = FPNVoxelNet(
        voxel_cfg=VCFG, num_classes=NUM_CLASSES, voxel_caps=(2048, 1024, 512, 512),
        rpn_layer_nums=LAYER_NUMS, rpn_ds_strides=DS_STRIDES, rpn_ds_filters=DS_FILTERS,
        rpn_us_strides=US_STRIDES, rpn_us_filters=US_FILTERS, backbone_impl="gather")
    pts = jnp.zeros((1, 16, 5), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), pts, jnp.ones((1, 16), bool), False,
                           voxels=(jnp.asarray(vf), jnp.asarray(vc), jnp.asarray(vv)))

    class _S:  # minimal TrainState stand-in with .replace
        def __init__(self, p, b):
            self.params, self.batch_stats = p, b

        def replace(self, params, batch_stats):
            return _S(params, batch_stats)

    state = apply_torch_init(_S(variables["params"], variables["batch_stats"]),
                             path, "gather")
    stem = np.asarray(
        state.params["FPNSpMiddleResNetFHD_0"]["SubMConv_0"]["kernel"])
    np.testing.assert_array_equal(
        stem, sd["backbone.middle_conv0.0.weight"].reshape(27, 5, 16))
    # a wrong-shape checkpoint must be rejected
    sd_bad = dict(sd)
    sd_bad["backbone.middle_conv0.0.weight"] = sd["backbone.middle_conv0.0.weight"][..., :8]
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, **{k.replace(".", "__dot__"): v for k, v in sd_bad.items()})
    with pytest.raises(ValueError):
        apply_torch_init(_S(variables["params"], variables["batch_stats"]), bad, "gather")


@pytest.mark.parametrize("impl,nested", [("gather", False), ("banded", True)])
def test_converted_forward_matches_torch_reference(impl, nested):
    rng = np.random.RandomState(0)
    sd = _rnd_state_dict(rng)
    vf, vc, vv, dense_in = _dense_voxels(rng)
    neck_ref, preds_ref = _torch_reference_forward(sd, dense_in)

    params, stats = convert_second_state_dict(sd, nested_l0=nested)
    model = FPNVoxelNet(
        voxel_cfg=VCFG, num_classes=NUM_CLASSES, voxel_caps=(2048, 1024, 512, 512),
        rpn_layer_nums=LAYER_NUMS, rpn_ds_strides=DS_STRIDES, rpn_ds_filters=DS_FILTERS,
        rpn_us_strides=US_STRIDES, rpn_us_filters=US_FILTERS,
        backbone_impl=impl,
        brick_widths=(16, 8, 4, 2, 2),
        banded_caps=(12032, 2048, 512, 256, 256),
        band_widths=(512, 256, 128, 128, 128), down_bands=(512, 256, 128, 128),
        band_fb_cap=128,
    )
    pts = jnp.zeros((1, 16, 5), jnp.float32)
    ref_vars = model.init(jax.random.PRNGKey(0), pts, jnp.ones((1, 16), bool), False,
                          voxels=(jnp.asarray(vf), jnp.asarray(vc), jnp.asarray(vv)))
    # converted tree must be structurally identical to a fresh init
    got_p, ref_p = flatten_tree(params), flatten_tree(ref_vars["params"])
    got_s, ref_s = flatten_tree(stats), flatten_tree(ref_vars["batch_stats"])
    assert sorted(got_p) == sorted(ref_p)
    assert sorted(got_s) == sorted(ref_s)
    for k in ref_p:
        assert got_p[k].shape == ref_p[k].shape, k
    out = model.apply(
        {"params": params, "batch_stats": stats},
        pts, jnp.ones((1, 16), bool), False,
        voxels=(jnp.asarray(vf), jnp.asarray(vc), jnp.asarray(vv)))

    np.testing.assert_allclose(np.asarray(out["neck_feat"]), neck_ref,
                               rtol=2e-3, atol=2e-3)
    for t, (box_ref, cls_ref) in enumerate(preds_ref):
        np.testing.assert_allclose(np.asarray(out["preds"][t]["box_preds"]),
                                   box_ref, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(out["preds"][t]["cls_preds"]),
                                   cls_ref, rtol=2e-3, atol=2e-3)
