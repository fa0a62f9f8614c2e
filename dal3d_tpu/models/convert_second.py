"""Torch CBGS VoxelNet checkpoint -> flax variables for FPNVoxelNet.

The reference trains det3d's VoxelNet (reader=VoxelFeatureExtractorV3 —
parameter-free mean VFE — backbone=SpMiddleResNetFHD / FPNSpMiddleResNetFHD,
neck=RPN, bbox_head=MultiGroupHead) and checkpoints it with torchie's
save_checkpoint (reference det3d/torchie/trainer/checkpoint.py:121-190:
a plain ``state_dict`` dict, possibly under a ``state_dict`` key, keys
optionally prefixed ``module.`` by DDP).

This module maps that state_dict onto our flax param/batch_stats trees:

- spconv conv weights are stored [kd, kh, kw, Cin, Cout]
  (bevfusion/mmdet3d/ops/spconv/conv.py:100); our sparse engines consume
  [kd*kh*kw, Cin, Cout] in the same z-major kernel-position order, so the
  map is a flat reshape (parity pinned by tests/test_convert_second.py's
  torch-dense-conv oracle, which would catch a kernel flip).
- torch Conv2d weights [Cout, Cin, kh, kw] -> flax [kh, kw, Cin, Cout]
  (transpose 2,3,1,0); ConvTranspose2d [Cin, Cout, kh, kw] -> flax
  [kh, kw, Cin, Cout] via (2,3,0,1) — flax's ConvTranspose applies the
  kernel unflipped while torch flips, so the spatial axes are reversed.
- BN: weight->scale, bias->bias, running_mean/var->batch_stats.

Backbone layout follows reference scn.py:316-393 (FPN variant;
``middle_conv{0..3}`` SparseSequentials) or :396-457 (non-FPN single
``middle_conv``); target tree layout matches our engines: the brick/banded
engines nest the L0 section under ``l0`` and the stages under
``stage{1..3}`` (nested=True, default); the gather/dense engines inline L0
at the backbone top level (nested=False) — see
tests/test_backbone_brick.py::_remap_brick_to_gather.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

__all__ = [
    "convert_second_state_dict",
    "load_torch_detector_npz",
    "apply_torch_init",
    "flatten_tree",
    "unflatten_tree",
]


def flatten_tree(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten_tree(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(v)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = v
    return tree


def _strip(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Unwrap DDP's ``module.`` prefix (checkpoint.py:102-110)."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items() if k.startswith("module.")}
    return dict(sd)


def _spconv_w(w: np.ndarray) -> np.ndarray:
    """[kd, kh, kw, Cin, Cout] -> [kd*kh*kw, Cin, Cout] (z-major taps)."""
    kd, kh, kw, ci, co = w.shape
    return np.ascontiguousarray(w.reshape(kd * kh * kw, ci, co)).astype(np.float32)


def _conv2d_w(w: np.ndarray) -> np.ndarray:
    """torch [Cout, Cin, kh, kw] -> flax [kh, kw, Cin, Cout]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))).astype(np.float32)


def _convT2d_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [Cin, Cout, kh, kw] -> flax [kh, kw, Cin, Cout].

    torch's transposed conv flips the kernel spatially relative to flax's
    ConvTranspose (which correlates), so reverse kh/kw."""
    return np.ascontiguousarray(
        np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))
    ).astype(np.float32)


def _bn(sd, pref, params, stats, dst):
    params[f"{dst}/scale"] = np.asarray(sd[f"{pref}.weight"], np.float32)
    params[f"{dst}/bias"] = np.asarray(sd[f"{pref}.bias"], np.float32)
    stats[f"{dst}/mean"] = np.asarray(sd[f"{pref}.running_mean"], np.float32)
    stats[f"{dst}/var"] = np.asarray(sd[f"{pref}.running_var"], np.float32)


def _basic_block(sd, pref, params, stats, dst):
    """SparseBasicBlock (reference scn.py:54-97): conv1/bn1/conv2/bn2."""
    params[f"{dst}/SubMConv_0/kernel"] = _spconv_w(np.asarray(sd[f"{pref}.conv1.weight"]))
    params[f"{dst}/SubMConv_0/bias"] = np.asarray(sd[f"{pref}.conv1.bias"], np.float32)
    _bn(sd, f"{pref}.bn1", params, stats, f"{dst}/MaskedBatchNorm_0")
    params[f"{dst}/SubMConv_1/kernel"] = _spconv_w(np.asarray(sd[f"{pref}.conv2.weight"]))
    params[f"{dst}/SubMConv_1/bias"] = np.asarray(sd[f"{pref}.conv2.bias"], np.float32)
    _bn(sd, f"{pref}.bn2", params, stats, f"{dst}/MaskedBatchNorm_1")


def convert_second_state_dict(
    state_dict: Dict[str, np.ndarray],
    nested_l0: bool = True,
    num_classes: Sequence[int] | None = None,
) -> Tuple[dict, dict]:
    """Convert a det3d CBGS VoxelNet state_dict to (params, batch_stats).

    nested_l0: True for the brick/banded engine layout (L0 under ``l0``),
    False for the gather/dense layout (L0 inlined).
    Returns nested flax trees keyed FPNSpMiddleResNetFHD_0 / RPN_0 /
    MultiGroupHead_0, i.e. the FPNVoxelNet module tree.
    """
    sd = _strip(state_dict)
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    # ---- backbone ----------------------------------------------------------
    bb = "FPNSpMiddleResNetFHD_0"
    l0 = f"{bb}/l0" if nested_l0 else bb
    fpn = any(k.startswith("backbone.middle_conv0.") for k in sd)
    if fpn:
        mc = ["backbone.middle_conv0", "backbone.middle_conv1",
              "backbone.middle_conv2", "backbone.middle_conv3"]
        # middle_conv0 Sequential: 0 stem subm, 1 BN, 2 relu, 3/4 blocks,
        # 5 down conv, 6 BN, 7 relu (reference scn.py:331-343)
        l0_idx = dict(stem=f"{mc[0]}.0", bn0=f"{mc[0]}.1", blk=(f"{mc[0]}.3", f"{mc[0]}.4"),
                      down=f"{mc[0]}.5", bn1=f"{mc[0]}.6")
        stage_idx = [
            dict(blk=(f"{m}.0", f"{m}.1"), down=f"{m}.2", bn=f"{m}.3") for m in mc[1:]
        ]
    else:
        # non-FPN single middle_conv Sequential (scn.py:410-448): indices
        # 0 stem, 1 bn, 3/4 blocks, 5 down, 6 bn | 8/9 blocks, 10 down, 11 bn
        # | 13/14, 15, 16 | 18/19, 20, 21
        m = "backbone.middle_conv"
        l0_idx = dict(stem=f"{m}.0", bn0=f"{m}.1", blk=(f"{m}.3", f"{m}.4"),
                      down=f"{m}.5", bn1=f"{m}.6")
        stage_idx = [
            dict(blk=(f"{m}.8", f"{m}.9"), down=f"{m}.10", bn=f"{m}.11"),
            dict(blk=(f"{m}.13", f"{m}.14"), down=f"{m}.15", bn=f"{m}.16"),
            dict(blk=(f"{m}.18", f"{m}.19"), down=f"{m}.20", bn=f"{m}.21"),
        ]

    params[f"{l0}/SubMConv_0/kernel"] = _spconv_w(np.asarray(sd[f"{l0_idx['stem']}.weight"]))
    _bn(sd, l0_idx["bn0"], params, stats, f"{l0}/MaskedBatchNorm_0")
    for i, blk in enumerate(l0_idx["blk"]):
        _basic_block(sd, blk, params, stats, f"{l0}/SparseBasicBlock_{i}")
    params[f"{l0}/SparseConvDown_0/kernel"] = _spconv_w(np.asarray(sd[f"{l0_idx['down']}.weight"]))
    _bn(sd, l0_idx["bn1"], params, stats, f"{l0}/MaskedBatchNorm_1")
    for s, si in enumerate(stage_idx, start=1):
        dst = f"{bb}/stage{s}"
        for i, blk in enumerate(si["blk"]):
            _basic_block(sd, blk, params, stats, f"{dst}/SparseBasicBlock_{i}")
        params[f"{dst}/SparseConvDown_0/kernel"] = _spconv_w(np.asarray(sd[f"{si['down']}.weight"]))
        _bn(sd, si["bn"], params, stats, f"{dst}/MaskedBatchNorm_0")

    # ---- RPN ---------------------------------------------------------------
    # reference rpn.py:124-141: block i = Sequential(ZeroPad, Conv, BN, ReLU,
    # then layer_num x [Conv, BN, ReLU]) -> conv at 1,4,7,..., BN at 2,5,8,...
    # deblock i = Sequential(Conv/ConvT, BN, ReLU).
    # our RPN numbers Conv/BatchNorm2d instances in same traversal order
    # (necks/rpn.py): block convs then the block's deblock.
    rp = "RPN_0"
    layer_nums = []
    i = 0
    while any(k.startswith(f"neck.blocks.{i}.") for k in sd):
        n = sum(1 for k in sd if k.startswith(f"neck.blocks.{i}.") and k.endswith(".weight")
                and sd[k].ndim == 4)
        layer_nums.append(n - 1)
        i += 1
    if not layer_nums:
        raise KeyError("no neck.blocks.* keys in state_dict")
    n_deblocks = sum(1 for k in sd if k.startswith("neck.deblocks.") and k.endswith(".0.weight"))
    upsample_start = len(layer_nums) - n_deblocks
    conv_i = bn_i = convT_i = 0
    for b, ln in enumerate(layer_nums):
        for j in range(ln + 1):
            seq = 1 + 3 * j  # ZeroPad consumes index 0; convs at 1, 4, 7, ...
            params[f"{rp}/Conv_{conv_i}/kernel"] = _conv2d_w(
                np.asarray(sd[f"neck.blocks.{b}.{seq}.weight"]))
            _bn(sd, f"neck.blocks.{b}.{seq + 1}", params, stats,
                f"{rp}/BatchNorm2d_{bn_i}/BatchNorm_0")
            conv_i += 1
            bn_i += 1
        d = b - upsample_start
        if d >= 0:
            w = np.asarray(sd[f"neck.deblocks.{d}.0.weight"])
            # ConvTranspose2d (upsampling deblocks) stores [Cin, Cout, k, k];
            # the stride<=1 branch is a Conv2d storing [Cout, Cin, k, k].
            # Tell them apart by where the block's out-channel count sits;
            # if Cin == Cout the only ambiguous case left is k == 1, which
            # the reference reaches only via the Conv branch.
            block_out = int(np.asarray(sd[f"neck.blocks.{b}.1.weight"]).shape[0])
            if w.shape[0] == block_out and w.shape[1] != block_out:
                is_convT = True
            elif w.shape[1] == block_out and w.shape[0] != block_out:
                is_convT = False
            else:  # square channel case: kernel==1 can only be the Conv branch
                is_convT = w.shape[2] > 1
            if is_convT:
                params[f"{rp}/ConvTranspose_{convT_i}/kernel"] = _convT2d_w(w)
                convT_i += 1
            else:
                params[f"{rp}/Conv_{conv_i}/kernel"] = _conv2d_w(w)
                conv_i += 1
            _bn(sd, f"neck.deblocks.{d}.1", params, stats,
                f"{rp}/BatchNorm2d_{bn_i}/BatchNorm_0")
            bn_i += 1

    # ---- multi-group head --------------------------------------------------
    # reference mg_head.py:199-226 Head(conv_box, conv_cls) per task; ours
    # numbers Conv_{2t} = box, Conv_{2t+1} = cls (heads/mg_head.py:42-50).
    hd = "MultiGroupHead_0"
    t = 0
    while f"bbox_head.tasks.{t}.conv_box.weight" in sd:
        params[f"{hd}/Conv_{2 * t}/kernel"] = _conv2d_w(
            np.asarray(sd[f"bbox_head.tasks.{t}.conv_box.weight"]))
        params[f"{hd}/Conv_{2 * t}/bias"] = np.asarray(
            sd[f"bbox_head.tasks.{t}.conv_box.bias"], np.float32)
        params[f"{hd}/Conv_{2 * t + 1}/kernel"] = _conv2d_w(
            np.asarray(sd[f"bbox_head.tasks.{t}.conv_cls.weight"]))
        params[f"{hd}/Conv_{2 * t + 1}/bias"] = np.asarray(
            sd[f"bbox_head.tasks.{t}.conv_cls.bias"], np.float32)
        t += 1
    if t == 0:
        raise KeyError("no bbox_head.tasks.*.conv_box keys in state_dict")

    return unflatten_tree(params), unflatten_tree(stats)


def load_torch_detector_npz(path: str, nested_l0: bool = True):
    """Load an npz written by tools/convert_second.py -> (params, batch_stats).

    The npz stores the RAW torch state_dict (key '/' replaced by '.') so one
    file serves both engine layouts; conversion happens at load."""
    return convert_second_state_dict(load_raw_state_dict_npz(path),
                                     nested_l0=nested_l0)


def apply_torch_init(state, npz_path: str, backbone_impl: str, logger=None):
    """Warm-start a TrainState from a converted reference checkpoint.

    Converted leaves overwrite matching init leaves (shape-checked); leaves
    the checkpoint does not cover (none for the standard CBGS detector) keep
    their init values and are reported."""
    nested = backbone_impl in ("brick", "banded")
    params, stats = load_torch_detector_npz(npz_path, nested_l0=nested)

    def merge(dst, src, what):
        d, s = flatten_tree(dst), flatten_tree(src)
        unknown = sorted(set(s) - set(d))
        if unknown:
            raise KeyError(f"{what}: converted keys not in model tree: {unknown[:5]}"
                           f" (+{max(len(unknown) - 5, 0)} more)")
        for k, v in s.items():
            if tuple(d[k].shape) != tuple(v.shape):
                raise ValueError(f"{what}: shape mismatch at {k}: "
                                 f"model {tuple(d[k].shape)} vs ckpt {tuple(v.shape)}")
            d[k] = v.astype(np.asarray(d[k]).dtype)
        missing = sorted(set(flatten_tree(dst)) - set(s))
        if missing and logger is not None:
            logger.info(f"torch_init: {len(missing)} {what} leaves not in "
                        f"checkpoint keep init values (e.g. {missing[0]})")
        return unflatten_tree(d)

    return state.replace(
        params=merge(state.params, params, "params"),
        batch_stats=merge(state.batch_stats, stats, "batch_stats"),
    )


def count_leaves(tree: dict) -> int:
    return len(flatten_tree(tree))


def save_raw_state_dict_npz(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write a RAW torch state_dict as npz ('.' escaped — npz keys may not
    contain dots); the paired loaders un-escape at load time."""
    np.savez(path, **{k.replace(".", "__dot__"): v for k, v in sd.items()})


def load_raw_state_dict_npz(path: str) -> Dict[str, np.ndarray]:
    flat = dict(np.load(path))
    return {k.replace("__dot__", "."): v for k, v in flat.items()}
