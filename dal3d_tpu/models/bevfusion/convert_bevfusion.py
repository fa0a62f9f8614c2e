"""Torch BEVFusion checkpoint -> flax variables for our BEVFusion model.

Maps the reference's torch state_dict (bevfusion/mmdet3d/models/
fusion_models/bevfusion.py module tree: encoders.{camera,lidar}, fuser,
decoder.{backbone,neck}, heads.object) onto the flax trees produced by
models/bevfusion/bevfusion.py. Works for both the camera+lidar fusion
checkpoint and the lidar-only TransFusion-L stage-1 checkpoint (no
encoders.camera / fuser keys).

Layout rules (see sparse_encoder.py / transfusion.py docstrings):

- The reference BEV map is [B, C, X, Y] (its vendored voxelizer emits
  (x,y,z) coords over sparse_shape [1440,1440,41]); ours is [B, Y, X, C].
  Every conv operating in BEV space (fuser, decoder, head, vtransform
  downsample) therefore converts with its two kernel spatial axes SWAPPED:
  conv_ours(M^T) == conv_ref(M)^T  iff  K_ours[i,j] = K_ref[j,i].
- Image-space convs (Swin, LSS FPN, dtransform/depthnet) convert with the
  plain [Cout,Cin,kh,kw] -> [kh,kw,Cin,Cout] transpose.
- Vendored spconv weights are [kx,ky,kz,Cin,Cout] (ops/spconv/conv.py:99,
  kernel dims follow the sparse tensor's (x,y,z) spatial dims); our sparse
  engines consume z-major flat taps -> transpose to (kz,ky,kx) then flatten.
- torch MultiheadAttention in_proj [3d, d] splits into flax q/k/v kernels
  [d, heads, head_dim]; out_proj [d, d] -> [heads, head_dim, d].
- Conv1d(k=1) == Dense: [Cout, Cin, 1] -> [Cin, Cout].
- BN: weight/bias -> scale/bias params; running_mean/var -> batch_stats.

The Swin sub-tree reuses convert_swin.convert_swin_state_dict (oracle-
tested in tests/test_swin_convert.py) on the ``encoders.camera.backbone.``
slice.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..convert_second import flatten_tree, unflatten_tree

__all__ = ["convert_bevfusion_state_dict", "load_torch_bevfusion_npz",
           "apply_torch_init_bevfusion"]


def _f32(v):
    return np.asarray(v, np.float32)


def _img_conv_w(w):
    """torch [Cout, Cin, kh, kw] -> flax [kh, kw, Cin, Cout] (image space)."""
    return np.ascontiguousarray(np.transpose(_f32(w), (2, 3, 1, 0)))


def _bev_conv_w(w):
    """BEV-space conv: image transpose + kh<->kw swap (layout note above)."""
    return np.ascontiguousarray(np.transpose(_f32(w), (3, 2, 1, 0)))


def _bev_convT_w(w):
    """torch ConvTranspose2d [Cin, Cout, kh, kw] in BEV space -> flax
    [kw, kh, Cin, Cout]; torch's transposed conv flips the kernel relative
    to flax's ConvTranspose, hence the spatial reversal."""
    return np.ascontiguousarray(np.transpose(_f32(w)[:, :, ::-1, ::-1], (3, 2, 0, 1)))


def _dense(w):
    return np.ascontiguousarray(_f32(w).T)


def _c1d(w):
    """Conv1d k=1 [Cout, Cin, 1] -> Dense [Cin, Cout]."""
    return np.ascontiguousarray(_f32(w)[:, :, 0].T)


def _spconv_w(w):
    """[kx, ky, kz, Cin, Cout] -> z-major flat [kz*ky*kx, Cin, Cout]."""
    w = _f32(w)
    kx, ky, kz, ci, co = w.shape
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0, 3, 4)).reshape(kz * ky * kx, ci, co))


class _Ctx:
    def __init__(self, sd):
        self.sd = sd
        self.params: Dict[str, np.ndarray] = {}
        self.stats: Dict[str, np.ndarray] = {}

    def bn2d(self, pref, dst):
        """torch BN -> our BatchNorm2d wrapper (flax BatchNorm inside)."""
        self.params[f"{dst}/BatchNorm_0/scale"] = _f32(self.sd[f"{pref}.weight"])
        self.params[f"{dst}/BatchNorm_0/bias"] = _f32(self.sd[f"{pref}.bias"])
        self.stats[f"{dst}/BatchNorm_0/mean"] = _f32(self.sd[f"{pref}.running_mean"])
        self.stats[f"{dst}/BatchNorm_0/var"] = _f32(self.sd[f"{pref}.running_var"])

    def mbn(self, pref, dst):
        """torch BN1d over sparse features -> our MaskedBatchNorm."""
        self.params[f"{dst}/scale"] = _f32(self.sd[f"{pref}.weight"])
        self.params[f"{dst}/bias"] = _f32(self.sd[f"{pref}.bias"])
        self.stats[f"{dst}/mean"] = _f32(self.sd[f"{pref}.running_mean"])
        self.stats[f"{dst}/var"] = _f32(self.sd[f"{pref}.running_var"])

    def conv(self, pref, dst, kind, bias=None):
        w = self.sd[f"{pref}.weight"]
        self.params[f"{dst}/kernel"] = kind(w)
        has_bias = f"{pref}.bias" in self.sd if bias is None else bias
        if has_bias:
            self.params[f"{dst}/bias"] = _f32(self.sd[f"{pref}.bias"])

    def attn(self, pref, dst, heads):
        d = int(self.sd[f"{pref}.in_proj_weight"].shape[1])
        hd = d // heads
        w = _f32(self.sd[f"{pref}.in_proj_weight"])  # [3d, d]
        b = _f32(self.sd[f"{pref}.in_proj_bias"])
        for i, name in enumerate(("query", "key", "value")):
            self.params[f"{dst}/{name}/kernel"] = np.ascontiguousarray(
                w[i * d:(i + 1) * d].T.reshape(d, heads, hd))
            self.params[f"{dst}/{name}/bias"] = b[i * d:(i + 1) * d].reshape(heads, hd)
        self.params[f"{dst}/out/kernel"] = np.ascontiguousarray(
            _f32(self.sd[f"{pref}.out_proj.weight"]).T.reshape(heads, hd, d))
        self.params[f"{dst}/out/bias"] = _f32(self.sd[f"{pref}.out_proj.bias"])

    def ln(self, pref, dst):
        self.params[f"{dst}/scale"] = _f32(self.sd[f"{pref}.weight"])
        self.params[f"{dst}/bias"] = _f32(self.sd[f"{pref}.bias"])


def _convert_sparse_encoder(c: _Ctx, src: str, dst: str):
    """encoders.lidar.backbone (mmdet3d SparseEncoder, basicblock type) ->
    our SparseEncoder_0 tree (sparse_encoder.py call order)."""
    sd = c.sd
    c.conv(f"{src}.conv_input.0", f"{dst}/SubMConv_0", _spconv_w)
    c.mbn(f"{src}.conv_input.1", f"{dst}/MaskedBatchNorm_0")
    blk = 0
    for stage in range(4):
        layer = f"{src}.encoder_layers.encoder_layer{stage + 1}"
        for j in (0, 1):
            b = f"{layer}.{j}"
            d = f"{dst}/SparseBasicBlock_{blk}"
            c.conv(f"{b}.conv1", f"{d}/SubMConv_0", _spconv_w)
            c.mbn(f"{b}.bn1", f"{d}/MaskedBatchNorm_0")
            c.conv(f"{b}.conv2", f"{d}/SubMConv_1", _spconv_w)
            c.mbn(f"{b}.bn2", f"{d}/MaskedBatchNorm_1")
            blk += 1
        if stage < 3:  # trailing strided downsample (make_block: conv 0, bn 1)
            c.conv(f"{layer}.2.0", f"{dst}/SparseConvDown_{stage}", _spconv_w)
            c.mbn(f"{layer}.2.1", f"{dst}/MaskedBatchNorm_{stage + 1}")
    c.conv(f"{src}.conv_out.0", f"{dst}/SparseConvDown_3", _spconv_w)
    c.mbn(f"{src}.conv_out.1", f"{dst}/MaskedBatchNorm_4")


def _convert_second_decoder(c: _Ctx, src: str, dst: str):
    """decoder.backbone (mmdet3d SECOND: blocks.{b} Sequential, convs at
    3j, BNs at 3j+1) -> our SECOND_0 (second.py call order)."""
    sd = c.sd
    ci = 0
    b = 0
    while any(k.startswith(f"{src}.blocks.{b}.") for k in sd):
        n = sum(1 for k in sd if k.startswith(f"{src}.blocks.{b}.")
                and k.endswith(".weight") and sd[k].ndim == 4)
        for j in range(n):
            c.conv(f"{src}.blocks.{b}.{3 * j}", f"{dst}/Conv_{ci}", _bev_conv_w)
            c.bn2d(f"{src}.blocks.{b}.{3 * j + 1}", f"{dst}/BatchNorm2d_{ci}")
            ci += 1
        b += 1
    if ci == 0:
        raise KeyError(f"no {src}.blocks.* keys")


def _convert_secondfpn(c: _Ctx, src: str, dst: str):
    """decoder.neck (mmdet3d SECONDFPN): deblock i = (Conv|ConvT, BN, ReLU);
    stride-1 entries are Conv (use_conv_for_no_stride)."""
    sd = c.sd
    conv_i = convT_i = 0
    d = 0
    while f"{src}.deblocks.{d}.0.weight" in sd:
        w = sd[f"{src}.deblocks.{d}.0.weight"]
        k = int(w.shape[2])
        if k == 1:  # stride-1 conv branch ([Cout, Cin, 1, 1])
            c.conv(f"{src}.deblocks.{d}.0", f"{dst}/Conv_{conv_i}", _bev_conv_w)
            conv_i += 1
        else:
            c.conv(f"{src}.deblocks.{d}.0", f"{dst}/ConvTranspose_{convT_i}", _bev_convT_w)
            convT_i += 1
        c.bn2d(f"{src}.deblocks.{d}.1", f"{dst}/BatchNorm2d_{d}")
        d += 1
    if d == 0:
        raise KeyError(f"no {src}.deblocks.* keys")


def _convert_lss_fpn(c: _Ctx, src: str, dst: str):
    """encoders.camera.neck (GeneralizedLSSFPN). Ours processes levels from
    coarse to fine: Conv_{2m} = lateral_convs[L-1-m], Conv_{2m+1} =
    fpn_convs[L-1-m] (lss_fpn.py top-down loop)."""
    sd = c.sd
    L = sum(1 for k in sd if k.startswith(f"{src}.lateral_convs.")
            and k.endswith(".conv.weight"))
    if L == 0:
        raise KeyError(f"no {src}.lateral_convs.* keys")
    for m in range(L):
        lvl = L - 1 - m
        c.conv(f"{src}.lateral_convs.{lvl}.conv", f"{dst}/Conv_{2 * m}", _img_conv_w)
        c.bn2d(f"{src}.lateral_convs.{lvl}.bn", f"{dst}/BatchNorm2d_{2 * m}")
        c.conv(f"{src}.fpn_convs.{lvl}.conv", f"{dst}/Conv_{2 * m + 1}", _img_conv_w)
        c.bn2d(f"{src}.fpn_convs.{lvl}.bn", f"{dst}/BatchNorm2d_{2 * m + 1}")


def _convert_vtransform(c: _Ctx, src: str, dst: str):
    """encoders.camera.vtransform (DepthLSSTransform, depth_lss.py:38-80):
    dtransform convs 0/3/6 (+BN 1/4/7), depthnet convs 0/3 (+BN 1/4) and
    final 1x1 conv 6, BEV-space downsample convs 0/3/6 (+BN 1/4/7)."""
    for i, t in enumerate((0, 3, 6)):
        c.conv(f"{src}.dtransform.{t}", f"{dst}/Conv_{i}", _img_conv_w)
        c.bn2d(f"{src}.dtransform.{t + 1}", f"{dst}/BatchNorm2d_{i}")
    for i, t in enumerate((0, 3)):
        c.conv(f"{src}.depthnet.{t}", f"{dst}/Conv_{3 + i}", _img_conv_w)
        c.bn2d(f"{src}.depthnet.{t + 1}", f"{dst}/BatchNorm2d_{3 + i}")
    c.conv(f"{src}.depthnet.6", f"{dst}/Conv_5", _img_conv_w)
    if f"{src}.downsample.0.weight" in c.sd:
        for i, t in enumerate((0, 3, 6)):
            c.conv(f"{src}.downsample.{t}", f"{dst}/Conv_{6 + i}", _bev_conv_w)
            c.bn2d(f"{src}.downsample.{t + 1}", f"{dst}/BatchNorm2d_{5 + i}")


def _convert_transfusion_head(c: _Ctx, src: str, dst: str, heads: int = 8):
    """heads.object (reference transfusion.py:95-160 + utils/transformer.py)
    -> our TransFusionHead_0 (transfusion.py named modules)."""
    sd = c.sd
    c.conv(f"{src}.shared_conv", f"{dst}/shared_conv", _bev_conv_w)
    c.conv(f"{src}.heatmap_head.0.conv", f"{dst}/heatmap_conv", _bev_conv_w)
    c.bn2d(f"{src}.heatmap_head.0.bn", f"{dst}/heatmap_bn")
    c.conv(f"{src}.heatmap_head.1", f"{dst}/heatmap_out", _bev_conv_w)
    c.params[f"{dst}/class_encoding/kernel"] = _c1d(sd[f"{src}.class_encoding.weight"])
    c.params[f"{dst}/class_encoding/bias"] = _f32(sd[f"{src}.class_encoding.bias"])

    for ours, theirs in (("self_posembed", "decoder.0.self_posembed"),
                         ("cross_posembed", "decoder.0.cross_posembed")):
        pe = f"{src}.{theirs}.position_embedding_head"
        c.params[f"{dst}/{ours}/fc1/kernel"] = _c1d(sd[f"{pe}.0.weight"])
        c.params[f"{dst}/{ours}/fc1/bias"] = _f32(sd[f"{pe}.0.bias"])
        c.bn2d(f"{pe}.1", f"{dst}/{ours}/bn")
        c.params[f"{dst}/{ours}/fc2/kernel"] = _c1d(sd[f"{pe}.3.weight"])
        c.params[f"{dst}/{ours}/fc2/bias"] = _f32(sd[f"{pe}.3.bias"])

    dl = f"{src}.decoder.0"
    dd = f"{dst}/decoder0"
    c.attn(f"{dl}.self_attn", f"{dd}/MultiHeadDotProductAttention_0", heads)
    c.attn(f"{dl}.multihead_attn", f"{dd}/MultiHeadDotProductAttention_1", heads)
    c.params[f"{dd}/Dense_0/kernel"] = _dense(sd[f"{dl}.linear1.weight"])
    c.params[f"{dd}/Dense_0/bias"] = _f32(sd[f"{dl}.linear1.bias"])
    c.params[f"{dd}/Dense_1/kernel"] = _dense(sd[f"{dl}.linear2.weight"])
    c.params[f"{dd}/Dense_1/bias"] = _f32(sd[f"{dl}.linear2.bias"])
    for i in (1, 2, 3):
        c.ln(f"{dl}.norm{i}", f"{dd}/LayerNorm_{i - 1}")

    for branch in ("center", "height", "dim", "rot", "vel", "heatmap"):
        ours = f"{dst}/pred_{branch}"
        pb = f"{src}.prediction_heads.0.{branch}"
        c.params[f"{ours}/conv0/kernel"] = _c1d(sd[f"{pb}.0.conv.weight"])
        c.bn2d(f"{pb}.0.bn", f"{ours}/bn0")
        c.params[f"{ours}/out/kernel"] = _c1d(sd[f"{pb}.1.weight"])
        c.params[f"{ours}/out/bias"] = _f32(sd[f"{pb}.1.bias"])


def convert_bevfusion_state_dict(
    state_dict: Dict[str, np.ndarray], num_heads: int = 8,
) -> Tuple[dict, dict]:
    """Convert a torch BEVFusion/TransFusion-L state_dict to
    (params, batch_stats) flax trees for models.bevfusion.BEVFusion."""
    sd = {k[len("module."):] if k.startswith("module.") else k: np.asarray(v)
          for k, v in state_dict.items()}
    c = _Ctx(sd)

    _convert_sparse_encoder(c, "encoders.lidar.backbone", "SparseEncoder_0")
    _convert_second_decoder(c, "decoder.backbone", "SECOND_0")
    _convert_secondfpn(c, "decoder.neck", "SECONDFPN_0")
    _convert_transfusion_head(c, "heads.object", "TransFusionHead_0", num_heads)

    with_camera = any(k.startswith("encoders.camera.") for k in sd)
    if with_camera:
        from .convert_swin import convert_swin_state_dict

        swin_sd = {k[len("encoders.camera.backbone."):]: v for k, v in sd.items()
                   if k.startswith("encoders.camera.backbone.")}
        swin_params = convert_swin_state_dict(swin_sd)
        for k, v in flatten_tree(swin_params).items():
            c.params[f"SwinTransformer_0/{k}"] = v
        _convert_lss_fpn(c, "encoders.camera.neck", "GeneralizedLSSFPN_0")
        _convert_vtransform(c, "encoders.camera.vtransform", "DepthLSSTransform_0")
        c.conv("fuser.0", "ConvFuser_0/Conv_0", _bev_conv_w)
        c.bn2d("fuser.1", "ConvFuser_0/BatchNorm2d_0")

    return unflatten_tree(c.params), unflatten_tree(c.stats)


def load_torch_bevfusion_npz(path: str, num_heads: int = 8):
    """Load an npz written by tools/convert_bevfusion.py (raw state_dict with
    '.' escaped) -> (params, batch_stats)."""
    from ..convert_second import load_raw_state_dict_npz

    return convert_bevfusion_state_dict(load_raw_state_dict_npz(path),
                                        num_heads=num_heads)


def apply_torch_init_bevfusion(variables: dict, npz_path: str, logger=None,
                               num_heads: int = 8) -> dict:
    """Overwrite matching leaves of an init variables dict with the converted
    checkpoint (shape-checked); unknown converted keys raise."""
    params, stats = load_torch_bevfusion_npz(npz_path, num_heads=num_heads)

    def merge(dst, src, what):
        d, s = flatten_tree(dst), flatten_tree(src)
        unknown = sorted(set(s) - set(d))
        if unknown:
            raise KeyError(f"{what}: converted keys not in model tree: "
                           f"{unknown[:5]} (+{max(len(unknown) - 5, 0)} more)")
        for k, v in s.items():
            if tuple(d[k].shape) != tuple(v.shape):
                raise ValueError(f"{what}: shape mismatch at {k}: model "
                                 f"{tuple(d[k].shape)} vs ckpt {tuple(v.shape)}")
            d[k] = v.astype(np.asarray(d[k]).dtype)
        missing = sorted(set(d) - set(s))
        if missing and logger is not None:
            logger.info(f"torch_init: {len(missing)} {what} leaves keep init "
                        f"values (e.g. {missing[0]})")
        return unflatten_tree(d)

    out = dict(variables)
    out["params"] = merge(variables["params"], params, "params")
    if "batch_stats" in variables:
        out["batch_stats"] = merge(variables["batch_stats"], stats, "batch_stats")
    return out
