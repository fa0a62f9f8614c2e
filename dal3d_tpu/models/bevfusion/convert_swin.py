"""Torch Swin checkpoint -> flax SwinTransformer params.

The reference camera branch warm-starts from the pretrained
``swint-nuimages`` torch checkpoint (bevfusion config
configs/nuscenes/det/transfusion/secfpn/camera+lidar/swint_v0p075/default.yaml:
7-27). This converter maps either naming scheme:
- microsoft/timm: ``patch_embed.proj``, ``layers.{i}.blocks.{j}.attn.qkv``,
  ``layers.{i}.downsample.reduction``, ``norm{i}``
- mmdet/mmcv: ``backbone.`` prefix, ``stages.``, ``attn.w_msa.``,
  ``ffn.layers.0.0 / ffn.layers.1``, ``patch_embed.projection``

Layout changes:
- conv kernels [out,in,kh,kw] -> [kh,kw,in,out]
- dense kernels [out,in] -> [in,out]
- patch-merging 4C input groups reordered: torch concatenates the 2x2
  neighborhood as [(0,0),(1,0),(0,1),(1,1)] (column-major), this module's
  reshape produces [(0,0),(0,1),(1,0),(1,1)] (row-major) -> group perm
  [0,2,1,3] on the reduction weight's input dim AND the preceding norm.
- relative_position_bias_table is identical (index convention matches —
  validated against a numpy oracle in tests/test_swin_convert.py).
"""
from __future__ import annotations

import re
from typing import Dict, Sequence

import numpy as np

_MERGE_PERM = (0, 2, 1, 3)  # torch 2x2-group index per our group slot


def _normalize(name: str) -> str:
    name = re.sub(r"^(backbone|module)\.", "", name)
    name = name.replace("patch_embed.projection", "patch_embed.proj")
    name = re.sub(r"^stages\.", "layers.", name)
    name = name.replace(".attn.w_msa.", ".attn.")
    name = name.replace(".ffn.layers.0.0.", ".mlp.fc1.")
    name = name.replace(".ffn.layers.1.", ".mlp.fc2.")
    return name


def _dense(w):  # torch [out, in] -> flax [in, out]
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _merge_groups(w4c: np.ndarray, axis: int) -> np.ndarray:
    """Permute the 4 C-sized groups along ``axis`` from torch order to ours."""
    C4 = w4c.shape[axis]
    g = np.split(np.asarray(w4c, np.float32), 4, axis=axis)
    return np.concatenate([g[p] for p in _MERGE_PERM], axis=axis)


def convert_swin_state_dict(
    sd: Dict[str, np.ndarray],
    depths: Sequence[int] = (2, 2, 6, 2),
    out_indices: Sequence[int] = (1, 2, 3),
) -> Dict:
    """Returns a flax param tree matching SwinTransformer.init's structure."""
    sd = {_normalize(k): np.asarray(v, np.float32) for k, v in sd.items()
          if "relative_position_index" not in k and "attn_mask" not in k}
    p: Dict = {}

    def put(path: str, val: np.ndarray):
        node = p
        parts = path.split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = val

    # patch embed
    w = sd["patch_embed.proj.weight"]  # [C, 3, kh, kw]
    put("Conv_0/kernel", np.ascontiguousarray(w.transpose(2, 3, 1, 0)))
    put("Conv_0/bias", sd["patch_embed.proj.bias"])
    put("LayerNorm_0/scale", sd["patch_embed.norm.weight"])
    put("LayerNorm_0/bias", sd["patch_embed.norm.bias"])

    blk = 0
    out_norm = 1  # LayerNorm_{1..} are the per-out-stage norms, in order
    for i, depth in enumerate(depths):
        for j in range(depth):
            t = f"layers.{i}.blocks.{j}."
            f = f"SwinBlock_{blk}/"
            put(f + "LayerNorm_0/scale", sd[t + "norm1.weight"])
            put(f + "LayerNorm_0/bias", sd[t + "norm1.bias"])
            put(f + "WindowAttention_0/Dense_0/kernel", _dense(sd[t + "attn.qkv.weight"]))
            put(f + "WindowAttention_0/Dense_0/bias", sd[t + "attn.qkv.bias"])
            put(f + "WindowAttention_0/relative_position_bias_table",
                sd[t + "attn.relative_position_bias_table"])
            put(f + "WindowAttention_0/Dense_1/kernel", _dense(sd[t + "attn.proj.weight"]))
            put(f + "WindowAttention_0/Dense_1/bias", sd[t + "attn.proj.bias"])
            put(f + "LayerNorm_1/scale", sd[t + "norm2.weight"])
            put(f + "LayerNorm_1/bias", sd[t + "norm2.bias"])
            put(f + "Dense_0/kernel", _dense(sd[t + "mlp.fc1.weight"]))
            put(f + "Dense_0/bias", sd[t + "mlp.fc1.bias"])
            put(f + "Dense_1/kernel", _dense(sd[t + "mlp.fc2.weight"]))
            put(f + "Dense_1/bias", sd[t + "mlp.fc2.bias"])
            blk += 1
        # downsample at end of torch layer i == our PatchMerging_{i} (before
        # stage i+1); the last stage has none
        dt = f"layers.{i}.downsample."
        if dt + "reduction.weight" in sd:
            put(f"PatchMerging_{i}/LayerNorm_0/scale", _merge_groups(sd[dt + "norm.weight"], 0))
            put(f"PatchMerging_{i}/LayerNorm_0/bias", _merge_groups(sd[dt + "norm.bias"], 0))
            put(f"PatchMerging_{i}/Dense_0/kernel",
                _dense(_merge_groups(sd[dt + "reduction.weight"], 1)))
        if i in out_indices:
            put(f"LayerNorm_{out_norm}/scale", sd[f"norm{i}.weight"])
            put(f"LayerNorm_{out_norm}/bias", sd[f"norm{i}.bias"])
            out_norm += 1
    return p


def tree_shapes(p: Dict, prefix: str = "") -> Dict[str, tuple]:
    out = {}
    for k, v in p.items():
        if isinstance(v, dict):
            out.update(tree_shapes(v, prefix + k + "/"))
        else:
            out[prefix + k] = tuple(np.shape(v))
    return out
