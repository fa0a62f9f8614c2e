"""Swin torch-checkpoint converter: numpy oracles for the two layout-sensitive
pieces (patch merging group order, qkv head layout) + full-tree structure
match + forward through converted weights."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dal3d_tpu.models.bevfusion.convert_swin import (
    convert_swin_state_dict, tree_shapes,
)
from dal3d_tpu.models.bevfusion.swin import (
    PatchMerging, SwinTransformer, WindowAttention, relative_position_index,
)


def _torch_style_sd(embed=24, depths=(2, 2), heads=(2, 4), ws=4,
                    out_indices=(0, 1), mmdet_names=False, seed=0):
    """Random state_dict in torch layout/naming (no torch needed)."""
    rng = np.random.RandomState(seed)
    r = lambda *s: rng.randn(*s).astype(np.float32) * 0.05
    pfx = "backbone." if mmdet_names else ""
    lay = "stages" if mmdet_names else "layers"
    attn = "attn.w_msa" if mmdet_names else "attn"
    proj = "projection" if mmdet_names else "proj"
    sd = {
        f"{pfx}patch_embed.{proj}.weight": r(embed, 3, 4, 4),
        f"{pfx}patch_embed.{proj}.bias": r(embed),
        f"{pfx}patch_embed.norm.weight": r(embed),
        f"{pfx}patch_embed.norm.bias": r(embed),
    }
    dim = embed
    for i, depth in enumerate(depths):
        if i > 0:
            dim *= 2
        for j in range(depth):
            t = f"{pfx}{lay}.{i}.blocks.{j}."
            sd[t + "norm1.weight"] = r(dim)
            sd[t + "norm1.bias"] = r(dim)
            sd[t + f"{attn}.qkv.weight"] = r(3 * dim, dim)
            sd[t + f"{attn}.qkv.bias"] = r(3 * dim)
            sd[t + f"{attn}.relative_position_bias_table"] = r((2 * ws - 1) ** 2, heads[i])
            sd[t + f"{attn}.relative_position_index"] = np.zeros((ws * ws, ws * ws), np.int64)
            sd[t + f"{attn}.proj.weight"] = r(dim, dim)
            sd[t + f"{attn}.proj.bias"] = r(dim)
            sd[t + "norm2.weight"] = r(dim)
            sd[t + "norm2.bias"] = r(dim)
            if mmdet_names:
                sd[t + "ffn.layers.0.0.weight"] = r(4 * dim, dim)
                sd[t + "ffn.layers.0.0.bias"] = r(4 * dim)
                sd[t + "ffn.layers.1.weight"] = r(dim, 4 * dim)
                sd[t + "ffn.layers.1.bias"] = r(dim)
            else:
                sd[t + "mlp.fc1.weight"] = r(4 * dim, dim)
                sd[t + "mlp.fc1.bias"] = r(4 * dim)
                sd[t + "mlp.fc2.weight"] = r(dim, 4 * dim)
                sd[t + "mlp.fc2.bias"] = r(dim)
        if i < len(depths) - 1:
            dt = f"{pfx}{lay}.{i}.downsample."
            sd[dt + "norm.weight"] = r(4 * dim)
            sd[dt + "norm.bias"] = r(4 * dim)
            sd[dt + "reduction.weight"] = r(2 * dim, 4 * dim)
        if i in out_indices:
            sd[f"{pfx}norm{i}.weight"] = r(dim)
            sd[f"{pfx}norm{i}.bias"] = r(dim)
    return sd


def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def test_patch_merging_matches_torch_oracle():
    """Microsoft-order concat + LN + reduction == our module with converted
    weights (the 4-group permutation is the thing under test)."""
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 6, 8, 12
    x = rng.randn(B, H, W, C).astype(np.float32)
    nw, nb = rng.randn(4 * C).astype(np.float32), rng.randn(4 * C).astype(np.float32)
    red = (rng.randn(2 * C, 4 * C) * 0.1).astype(np.float32)

    # torch oracle: cat([x00, x10, x01, x11]) -> LN -> @ red.T
    cat = np.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1
    )
    want = _ln(cat, nw, nb) @ red.T

    sd = {"layers.0.downsample.norm.weight": nw, "layers.0.downsample.norm.bias": nb,
          "layers.0.downsample.reduction.weight": red}
    conv = convert_swin_state_dict(
        {**sd, **{k: v for k, v in _torch_style_sd(embed=C, depths=(1,),
                                                   heads=(2,), out_indices=()).items()}},
        depths=(1,), out_indices=(),
    )
    # run just the merged params through our module
    params = {"LayerNorm_0": conv["PatchMerging_0"]["LayerNorm_0"],
              "Dense_0": conv["PatchMerging_0"]["Dense_0"]}
    got = PatchMerging(dim=C).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_window_attention_matches_torch_oracle():
    """qkv/proj layout + relative-position-bias indexing."""
    rng = np.random.RandomState(1)
    ws, h, C = 4, 2, 16
    L = ws * ws
    x = rng.randn(3, L, C).astype(np.float32)  # 3 windows
    qkv_w = (rng.randn(3 * C, C) * 0.1).astype(np.float32)
    qkv_b = (rng.randn(3 * C) * 0.1).astype(np.float32)
    rpb = (rng.randn((2 * ws - 1) ** 2, h) * 0.1).astype(np.float32)
    pw = (rng.randn(C, C) * 0.1).astype(np.float32)
    pb = (rng.randn(C) * 0.1).astype(np.float32)

    # torch oracle (microsoft WindowAttention forward)
    idx = relative_position_index(ws)
    d = C // h
    want = np.zeros_like(x)
    for wi in range(3):
        qkv = x[wi] @ qkv_w.T + qkv_b  # [L, 3C]
        qkv = qkv.reshape(L, 3, h, d).transpose(1, 2, 0, 3)  # [3, h, L, d]
        q, k, v = qkv[0] * d ** -0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(0, 2, 1)  # [h, L, L]
        attn = attn + rpb[idx.reshape(-1)].reshape(L, L, h).transpose(2, 0, 1)
        attn = np.exp(attn - attn.max(-1, keepdims=True))
        attn = attn / attn.sum(-1, keepdims=True)
        o = (attn @ v).transpose(1, 0, 2).reshape(L, C)
        want[wi] = o @ pw.T + pb

    params = {
        "Dense_0": {"kernel": qkv_w.T, "bias": qkv_b},
        "relative_position_bias_table": rpb,
        "Dense_1": {"kernel": pw.T, "bias": pb},
    }
    got = WindowAttention(dim=C, num_heads=h, window_size=ws).apply(
        {"params": params}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mmdet_names", [False, True])
def test_full_convert_structure_and_forward(mmdet_names):
    model = SwinTransformer(embed_dim=24, depths=(2, 2), num_heads=(2, 4),
                            out_indices=(0, 1), window_size=4)
    x = jnp.zeros((1, 64, 64, 3))
    ref = model.init(jax.random.PRNGKey(0), x, False)["params"]
    sd = _torch_style_sd(mmdet_names=mmdet_names)
    conv = convert_swin_state_dict(sd, depths=(2, 2), out_indices=(0, 1))
    assert tree_shapes(conv) == tree_shapes(ref)
    outs = model.apply({"params": conv}, x, False)
    assert [o.shape for o in outs] == [(1, 16, 16, 24), (1, 8, 8, 48)]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
