"""BEVFusion checkpoint-converter parity: a reference-named torch state_dict
(lidar-only TransFusion-L tree: encoders.lidar.backbone + decoder +
heads.object) is converted to flax variables, and our BEVFusion forward must
match a torch replica of the reference math on a fully-dense voxel grid.

The torch replica runs in the REFERENCE layout ([B, C, X, Y] BEV maps from
an (x,y,z)-ordered dense grid, sparse_encoder.py:126-130) while our model
runs zyx/[B, Y, X, C]; agreement therefore validates every layout rule in
convert_bevfusion.py at once — the spconv tap transpose, the BEV-conv
kernel swap, the attention in_proj split, and the head's positional-vector
semantics (transfusion.py layout note).

Same oracle trick as test_convert_second.py: on a fully-dense grid,
submanifold/strided sparse conv == dense conv3d, so the reference backbone
collapses to torch eval-mode F.conv3d/F.batch_norm.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from dal3d_tpu.models.bevfusion import BEVFusion  # noqa: E402
from dal3d_tpu.models.bevfusion.convert_bevfusion import (  # noqa: E402
    convert_bevfusion_state_dict,
)
from dal3d_tpu.models.convert_second import flatten_tree  # noqa: E402
from dal3d_tpu.ops.voxelize import VoxelConfig  # noqa: E402

# grid 16x16x41 (x, y, z) -> our sparse shape (41, 16, 16); BEV 2x2 after /8
VCFG = VoxelConfig(
    point_cloud_range=(-2.0, -2.0, -1.025, 2.0, 2.0, 1.025),
    voxel_size=(0.25, 0.25, 0.05),
    max_points_in_voxel=5,
    max_voxel_num=41 * 16 * 16,
)
NC, P_PROP, D_HID, HEADS = 10, 4, 32, 4
ENC = ((4, 4, 8), (8, 8, 16), (16, 16, 32), (32, 32))
DEC_CH = (16, 32)


def _rnd_sd(rng):
    sd = {}

    def spconv(name, ci, co, k=(3, 3, 3)):
        # fan-in-scaled so 20+ stacked layers keep O(1) activations (huge
        # logits would saturate the head sigmoid and make top-k order a tie)
        s = 1.0 / np.sqrt(np.prod(k) * ci)
        sd[f"{name}.weight"] = (rng.randn(*k, ci, co) * s).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = (1 + 0.2 * rng.randn(c)).astype(np.float32)
        sd[f"{name}.bias"] = (0.1 * rng.randn(c)).astype(np.float32)
        sd[f"{name}.running_mean"] = (0.1 * rng.randn(c)).astype(np.float32)
        sd[f"{name}.running_var"] = (1 + 0.1 * rng.rand(c)).astype(np.float32)

    def conv2d(name, ci, co, k=3, bias=True):
        s = 1.0 / np.sqrt(k * k * ci)
        sd[f"{name}.weight"] = (rng.randn(co, ci, k, k) * s).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.randn(co).astype(np.float32) * 0.05

    def conv1d(name, ci, co, bias=True):
        sd[f"{name}.weight"] = (rng.randn(co, ci, 1) / np.sqrt(ci)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.randn(co).astype(np.float32) * 0.05

    def lin(name, ci, co):
        sd[f"{name}.weight"] = (rng.randn(co, ci) / np.sqrt(ci)).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(co).astype(np.float32) * 0.05

    # ---- encoders.lidar.backbone -----------------------------------------
    eb = "encoders.lidar.backbone"
    spconv(f"{eb}.conv_input.0", 5, ENC[0][0])
    bn(f"{eb}.conv_input.1", ENC[0][0])
    for i, chans in enumerate(ENC):
        layer = f"{eb}.encoder_layers.encoder_layer{i + 1}"
        c = chans[0]
        for j in (0, 1):
            spconv(f"{layer}.{j}.conv1", c, c)
            bn(f"{layer}.{j}.bn1", c)
            spconv(f"{layer}.{j}.conv2", c, c)
            bn(f"{layer}.{j}.bn2", c)
        if i < 3:
            spconv(f"{layer}.2.0", c, chans[-1])
            bn(f"{layer}.2.1", chans[-1])
    spconv(f"{eb}.conv_out.0", ENC[-1][-1], ENC[-1][-1], k=(1, 1, 3))
    bn(f"{eb}.conv_out.1", ENC[-1][-1])

    # ---- decoder ---------------------------------------------------------
    cin = ENC[-1][-1] * 2
    for b, co in enumerate(DEC_CH):
        for j in range(3):  # 1 lead conv + 2 layer convs
            conv2d(f"decoder.backbone.blocks.{b}.{3 * j}", cin if j == 0 else co,
                   co, bias=False)
            bn(f"decoder.backbone.blocks.{b}.{3 * j + 1}", co)
        cin = co
    # neck: deblock0 = stride-1 Conv k1, deblock1 = ConvT k2 s2
    sd["decoder.neck.deblocks.0.0.weight"] = (
        (rng.randn(D_HID * 2, DEC_CH[0], 1, 1) / np.sqrt(DEC_CH[0])).astype(np.float32))
    bn("decoder.neck.deblocks.0.1", D_HID * 2)
    sd["decoder.neck.deblocks.1.0.weight"] = (
        (rng.randn(DEC_CH[1], D_HID * 2, 2, 2) / np.sqrt(4 * DEC_CH[1])).astype(np.float32))
    bn("decoder.neck.deblocks.1.1", D_HID * 2)

    # ---- heads.object ----------------------------------------------------
    hd = "heads.object"
    cbev = D_HID * 4
    conv2d(f"{hd}.shared_conv", cbev, D_HID)
    conv2d(f"{hd}.heatmap_head.0.conv", D_HID, D_HID, bias=False)
    bn(f"{hd}.heatmap_head.0.bn", D_HID)
    conv2d(f"{hd}.heatmap_head.1", D_HID, NC)
    conv1d(f"{hd}.class_encoding", NC, D_HID)
    for pe in ("self_posembed", "cross_posembed"):
        conv1d(f"{hd}.decoder.0.{pe}.position_embedding_head.0", 2, D_HID)
        bn(f"{hd}.decoder.0.{pe}.position_embedding_head.1", D_HID)
        conv1d(f"{hd}.decoder.0.{pe}.position_embedding_head.3", D_HID, D_HID)
    dl = f"{hd}.decoder.0"
    for att in ("self_attn", "multihead_attn"):
        sd[f"{dl}.{att}.in_proj_weight"] = (
            (rng.randn(3 * D_HID, D_HID) / np.sqrt(D_HID)).astype(np.float32))
        sd[f"{dl}.{att}.in_proj_bias"] = rng.randn(3 * D_HID).astype(np.float32) * 0.05
        lin(f"{dl}.{att}.out_proj", D_HID, D_HID)
    lin(f"{dl}.linear1", D_HID, D_HID * 2)
    lin(f"{dl}.linear2", D_HID * 2, D_HID)
    for i in (1, 2, 3):
        sd[f"{dl}.norm{i}.weight"] = (1 + 0.1 * rng.randn(D_HID)).astype(np.float32)
        sd[f"{dl}.norm{i}.bias"] = rng.randn(D_HID).astype(np.float32) * 0.05
    for branch, out in (("center", 2), ("height", 1), ("dim", 3), ("rot", 2),
                        ("vel", 2), ("heatmap", NC)):
        pb = f"{hd}.prediction_heads.0.{branch}"
        conv1d(f"{pb}.0.conv", D_HID, 64, bias=False)
        bn(f"{pb}.0.bn", 64)
        conv1d(f"{pb}.1", 64, out)
    return sd


def _t_bn(x, sd, p, eps=1e-3):
    # sparse/2d BN in the reference trains with mmdet3d norm_cfg eps=1e-3
    shape = [1, -1] + [1] * (x.dim() - 2)
    m = torch.as_tensor(sd[f"{p}.running_mean"]).view(shape)
    v = torch.as_tensor(sd[f"{p}.running_var"]).view(shape)
    w = torch.as_tensor(sd[f"{p}.weight"]).view(shape)
    b = torch.as_tensor(sd[f"{p}.bias"]).view(shape)
    return (x - m) / torch.sqrt(v + eps) * w + b


def _t_bn1d_torcheps(x, sd, p):
    return _t_bn(x, sd, p, eps=1e-5)


def _t_conv3(x, sd, p, stride=1, padding=1):
    w = torch.as_tensor(sd[f"{p}.weight"]).permute(4, 3, 0, 1, 2)  # [co,ci,kx,ky,kz]
    return F.conv3d(x, w, None, stride=stride, padding=padding)


def _t_block(x, sd, p):
    out = F.relu(_t_bn(_t_conv3(x, sd, f"{p}.conv1"), sd, f"{p}.bn1"))
    out = _t_bn(_t_conv3(out, sd, f"{p}.conv2"), sd, f"{p}.bn2")
    return F.relu(out + x)


def _t_encoder(sd, dense_xyz):
    """[1, 5, X, Y, Z] -> reference BEV [1, C*D, X, Y]."""
    eb = "encoders.lidar.backbone"
    x = torch.as_tensor(dense_xyz)
    x = F.relu(_t_bn(_t_conv3(x, sd, f"{eb}.conv_input.0"), sd, f"{eb}.conv_input.1"))
    for i in range(4):
        layer = f"{eb}.encoder_layers.encoder_layer{i + 1}"
        x = _t_block(x, sd, f"{layer}.0")
        x = _t_block(x, sd, f"{layer}.1")
        if i < 3:
            pad = 1 if i < 2 else (1, 1, 0)
            x = F.relu(_t_bn(_t_conv3(x, sd, f"{layer}.2.0", stride=2, padding=pad),
                             sd, f"{layer}.2.1"))
    x = F.conv3d(x, torch.as_tensor(sd[f"{eb}.conv_out.0.weight"]).permute(4, 3, 0, 1, 2),
                 None, stride=(1, 1, 2), padding=0)
    x = F.relu(_t_bn(x, sd, f"{eb}.conv_out.1"))
    N, C, X, Y, Z = x.shape
    return x.permute(0, 1, 4, 2, 3).reshape(N, C * Z, X, Y)


def _t_decoder(sd, bev):
    outs = []
    x = bev
    for b, stride in enumerate((1, 2)):
        for j in range(3):
            w = torch.as_tensor(sd[f"decoder.backbone.blocks.{b}.{3 * j}.weight"])
            x = F.conv2d(x, w, None, stride=stride if j == 0 else 1, padding=1)
            x = F.relu(_t_bn(x, sd, f"decoder.backbone.blocks.{b}.{3 * j + 1}"))
        outs.append(x)
    u0 = F.conv2d(outs[0], torch.as_tensor(sd["decoder.neck.deblocks.0.0.weight"]))
    u0 = F.relu(_t_bn(u0, sd, "decoder.neck.deblocks.0.1"))
    u1 = F.conv_transpose2d(outs[1], torch.as_tensor(sd["decoder.neck.deblocks.1.0.weight"]),
                            stride=2)
    u1 = F.relu(_t_bn(u1, sd, "decoder.neck.deblocks.1.1"))
    return torch.cat([u0, u1], dim=1)


def _t_posembed(sd, p, xy):
    """xy [1, P, 2] -> [1, P, D] (PositionEmbeddingLearned, BN eps 1e-5)."""
    x = xy.transpose(1, 2)  # [1, 2, P]
    pe = f"{p}.position_embedding_head"
    x = F.conv1d(x, torch.as_tensor(sd[f"{pe}.0.weight"]), torch.as_tensor(sd[f"{pe}.0.bias"]))
    x = F.relu(_t_bn1d_torcheps(x, sd, f"{pe}.1"))
    x = F.conv1d(x, torch.as_tensor(sd[f"{pe}.3.weight"]), torch.as_tensor(sd[f"{pe}.3.bias"]))
    return x.transpose(1, 2)


def _t_attn(sd, p, q, k, v):
    """[L, 1, D] attention via torch functional (eval, no dropout)."""
    out, _ = F.multi_head_attention_forward(
        q, k, v, D_HID, HEADS,
        torch.as_tensor(sd[f"{p}.in_proj_weight"]), torch.as_tensor(sd[f"{p}.in_proj_bias"]),
        None, None, False, 0.0,
        torch.as_tensor(sd[f"{p}.out_proj.weight"]), torch.as_tensor(sd[f"{p}.out_proj.bias"]),
        training=False, need_weights=False)
    return out


def _t_ln(sd, p, x):
    return F.layer_norm(x, (x.shape[-1],), torch.as_tensor(sd[f"{p}.weight"]),
                        torch.as_tensor(sd[f"{p}.bias"]))


def _t_ffn_branch(sd, p, q):
    """q [1, P, D] -> [1, P, out] (FFN branch, BN1d eps 1e-5)."""
    x = q.transpose(1, 2)
    x = F.conv1d(x, torch.as_tensor(sd[f"{p}.0.conv.weight"]), None)
    x = F.relu(_t_bn1d_torcheps(x, sd, f"{p}.0.bn"))
    x = F.conv1d(x, torch.as_tensor(sd[f"{p}.1.weight"]), torch.as_tensor(sd[f"{p}.1.bias"]))
    return x.transpose(1, 2)


def _t_head(sd, bev):
    """Reference TransFusionHead forward (transfusion.py:224-311), eval."""
    hd = "heads.object"
    x = F.conv2d(bev, torch.as_tensor(sd[f"{hd}.shared_conv.weight"]),
                 torch.as_tensor(sd[f"{hd}.shared_conv.bias"]), padding=1)
    h = F.conv2d(x, torch.as_tensor(sd[f"{hd}.heatmap_head.0.conv.weight"]), None, padding=1)
    # ConvModule BN2d = torch-default eps 1e-5 (unlike the mmdet3d
    # norm_cfg eps-1e-3 BNs elsewhere)
    h = F.relu(_t_bn1d_torcheps(h, sd, f"{hd}.heatmap_head.0.bn"))
    heat = F.conv2d(h, torch.as_tensor(sd[f"{hd}.heatmap_head.1.weight"]),
                    torch.as_tensor(sd[f"{hd}.heatmap_head.1.bias"]), padding=1)
    _, _, X, Y = heat.shape
    prob = heat.sigmoid()
    pooled = F.max_pool2d(prob, 3, stride=1, padding=1)
    local_max = torch.zeros_like(pooled)
    local_max[:, :, 1:-1, 1:-1] = pooled[:, :, 1:-1, 1:-1]
    local_max[:, 8:] = prob[:, 8:]  # pedestrian/traffic_cone kernel-1 pool
    masked = prob * (prob == local_max)
    scores, idx = masked.view(1, -1).topk(P_PROP)  # class-major (nc, X, Y)
    cls = idx // (X * Y)
    pix = idx % (X * Y)
    feat_flat = x.view(1, D_HID, X * Y)
    q_feat = feat_flat.gather(2, pix[:, None, :].expand(-1, D_HID, -1))  # [1,D,P]
    one_hot = F.one_hot(cls, NC).float().transpose(1, 2)  # [1, NC, P]
    q_feat = q_feat + F.conv1d(one_hot, torch.as_tensor(sd[f"{hd}.class_encoding.weight"]),
                               torch.as_tensor(sd[f"{hd}.class_encoding.bias"]))
    # bev_pos entry k = (k // Y + 0.5, k % Y + 0.5) (create_2D_grid :173-183)
    q_xy = torch.stack([(pix // Y).float(), (pix % Y).float()], -1) + 0.5  # [1,P,2]
    kk = torch.arange(X * Y)
    kv_xy = torch.stack([(kk // Y).float(), (kk % Y).float()], -1)[None] + 0.5

    q_pos = _t_posembed(sd, f"{hd}.decoder.0.self_posembed", q_xy)  # [1,P,D]
    kv_pos = _t_posembed(sd, f"{hd}.decoder.0.cross_posembed", kv_xy)

    # decoder layer (utils/transformer.py:71-111), [L, 1, D] layout
    q = q_feat.permute(2, 0, 1)
    kv = feat_flat.permute(2, 0, 1)
    qp = q_pos.permute(1, 0, 2)
    kp = kv_pos.permute(1, 0, 2)
    dl = f"{hd}.decoder.0"
    qe = q + qp
    q = _t_ln(sd, f"{dl}.norm1", q + _t_attn(sd, f"{dl}.self_attn", qe, qe, qe))
    ke = kv + kp
    q = _t_ln(sd, f"{dl}.norm2", q + _t_attn(sd, f"{dl}.multihead_attn", q + qp, ke, ke))
    y = F.linear(q, torch.as_tensor(sd[f"{dl}.linear1.weight"]),
                 torch.as_tensor(sd[f"{dl}.linear1.bias"]))
    y = F.linear(F.relu(y), torch.as_tensor(sd[f"{dl}.linear2.weight"]),
                 torch.as_tensor(sd[f"{dl}.linear2.bias"]))
    q = _t_ln(sd, f"{dl}.norm3", q + y)
    q = q.permute(1, 0, 2)  # [1, P, D]

    out = {}
    for branch in ("center", "height", "dim", "rot", "vel", "heatmap"):
        out[branch] = _t_ffn_branch(sd, f"{hd}.prediction_heads.0.{branch}", q)
    out["center"] = out["center"] + q_xy
    out["scores"], out["cls"], out["heatmap_dense"] = scores, cls, heat
    return out


def test_converted_bevfusion_matches_torch_reference():
    rng = np.random.RandomState(0)
    sd = _rnd_sd(rng)
    params, stats = convert_bevfusion_state_dict(sd, num_heads=HEADS)

    # dense voxel inputs: one point per voxel center; feature channels are
    # the point coordinates themselves + 2 random channels
    X = Y = 16
    Z = 41
    xs, ys, zs = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z), indexing="ij")
    cx = -2.0 + (xs.ravel() + 0.5) * 0.25
    cy = -2.0 + (ys.ravel() + 0.5) * 0.25
    cz = -1.025 + (zs.ravel() + 0.5) * 0.05
    extra = rng.randn(cx.size, 2).astype(np.float32)
    pts = np.stack([cx, cy, cz], 1).astype(np.float32)
    pts = np.concatenate([pts, extra], 1)  # [N, 5]

    dense_xyz = np.zeros((1, 5, X, Y, Z), np.float32)
    dense_xyz[0, :, xs.ravel(), ys.ravel(), zs.ravel()] = pts

    bev_ref = _t_encoder(sd, dense_xyz)
    neck_ref = _t_decoder(sd, bev_ref)
    head_ref = _t_head(sd, neck_ref)

    model = BEVFusion(
        voxel_cfg=VCFG, with_camera=False, num_classes=NC, num_proposals=P_PROP,
        decoder_channels=DEC_CH, decoder_layer_nums=(2, 2),
        neck_out_channels=(D_HID * 2, D_HID * 2),
        voxel_caps=(X * Y * Z, 4096, 1024, 512),
        encoder_channels=ENC, hidden_channel=D_HID, num_heads=HEADS,
        ffn_channel=D_HID * 2,
    )
    batch = {"points": jnp.asarray(pts)[None], "points_valid": jnp.ones((1, len(pts)), bool)}
    init_vars = model.init(jax.random.PRNGKey(0), batch, False)
    got_p, ref_p = flatten_tree(params), flatten_tree(init_vars["params"])
    got_s, ref_s = flatten_tree(stats), flatten_tree(init_vars["batch_stats"])
    assert sorted(got_p) == sorted(ref_p)
    assert sorted(got_s) == sorted(ref_s)
    for k in ref_p:
        assert got_p[k].shape == tuple(ref_p[k].shape), k

    preds = model.apply({"params": params, "batch_stats": stats}, batch, False)

    # heatmap: ours [1, Ybev, Xbev, nc] row=y; reference [1, nc, X, Y]
    hm_ours = np.asarray(preds["heatmap"])[0].transpose(2, 1, 0)  # -> [nc, X, Y]
    hm_ref = head_ref["heatmap_dense"][0].numpy()
    np.testing.assert_allclose(hm_ours, hm_ref, rtol=2e-4, atol=2e-4)

    # proposals: same scores (sorted) and same per-proposal outputs after
    # aligning by score order (both top-k produce descending scores; random
    # inputs make ties measure-zero)
    np.testing.assert_allclose(np.asarray(preds["query_score"])[0],
                               head_ref["scores"][0].numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(preds["query_labels"])[0],
                                  head_ref["cls"][0].numpy())
    for branch, ours_key in (("center", "center"), ("height", "height"),
                             ("dim", "dim"), ("rot", "rot"), ("vel", "vel"),
                             ("heatmap", "cls_logits")):
        np.testing.assert_allclose(
            np.asarray(preds[ours_key])[0], head_ref[branch][0].numpy(),
            rtol=5e-4, atol=5e-4, err_msg=branch)

    # decode composition (reference get_bboxes :724-731): label = query
    # class; score = sigmoid(cls logit at that class) * query score
    from dal3d_tpu.models.bevfusion.transfusion import (
        TransFusionTestCfg, transfusion_decode,
    )

    dec = transfusion_decode(preds, TransFusionTestCfg(
        out_size_factor=8, voxel_size=(0.25, 0.25), pc_range=(-2.0, -2.0)))
    logit_q = np.take_along_axis(
        head_ref["heatmap"][0].numpy(), head_ref["cls"][0].numpy()[:, None], axis=-1
    )[:, 0]
    ref_scores = (1 / (1 + np.exp(-logit_q))) * head_ref["scores"][0].numpy()
    np.testing.assert_allclose(np.asarray(dec["scores"])[0], ref_scores,
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(dec["label_preds"])[0],
                                  head_ref["cls"][0].numpy())


@pytest.mark.slow
def test_camera_lidar_converted_tree_matches_init():
    """Structural parity for the FULL camera+lidar checkpoint: a fake torch
    BEVFusion state_dict at the reference's default dims converts to exactly
    the key set + shapes of a fresh init (ordering bugs in the LSS-FPN
    lateral/vtransform/fuser mappings surface as shape mismatches; Swin
    numerics are oracle-tested separately in test_swin_convert.py)."""
    rng = np.random.RandomState(0)

    def r(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.02

    sd = {}

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    # ---- swin-T under encoders.camera.backbone ---------------------------
    sb = "encoders.camera.backbone"
    C0, depths, heads, win = 96, (2, 2, 6, 2), (3, 6, 12, 24), 7
    sd[f"{sb}.patch_embed.proj.weight"] = r(C0, 3, 4, 4)
    sd[f"{sb}.patch_embed.proj.bias"] = r(C0)
    sd[f"{sb}.patch_embed.norm.weight"] = r(C0)
    sd[f"{sb}.patch_embed.norm.bias"] = r(C0)
    for i, d in enumerate(depths):
        C = C0 * 2 ** i
        for j in range(d):
            t = f"{sb}.layers.{i}.blocks.{j}"
            for nm in ("norm1", "norm2"):
                sd[f"{t}.{nm}.weight"] = r(C)
                sd[f"{t}.{nm}.bias"] = r(C)
            sd[f"{t}.attn.qkv.weight"] = r(3 * C, C)
            sd[f"{t}.attn.qkv.bias"] = r(3 * C)
            sd[f"{t}.attn.relative_position_bias_table"] = r((2 * win - 1) ** 2, heads[i])
            sd[f"{t}.attn.proj.weight"] = r(C, C)
            sd[f"{t}.attn.proj.bias"] = r(C)
            sd[f"{t}.mlp.fc1.weight"] = r(4 * C, C)
            sd[f"{t}.mlp.fc1.bias"] = r(4 * C)
            sd[f"{t}.mlp.fc2.weight"] = r(C, 4 * C)
            sd[f"{t}.mlp.fc2.bias"] = r(C)
        if i < 3:
            sd[f"{sb}.layers.{i}.downsample.norm.weight"] = r(4 * C)
            sd[f"{sb}.layers.{i}.downsample.norm.bias"] = r(4 * C)
            sd[f"{sb}.layers.{i}.downsample.reduction.weight"] = r(2 * C, 4 * C)
    for i in (1, 2, 3):
        sd[f"{sb}.norm{i}.weight"] = r(C0 * 2 ** i)
        sd[f"{sb}.norm{i}.bias"] = r(C0 * 2 ** i)

    # ---- camera neck (GeneralizedLSSFPN, ins [192,384,768], out 256) -----
    nk = "encoders.camera.neck"
    ins = (192, 384, 768)
    for lvl, cin in ((0, ins[0] + 256), (1, ins[1] + ins[2])):
        sd[f"{nk}.lateral_convs.{lvl}.conv.weight"] = r(256, cin, 1, 1)
        bn(f"{nk}.lateral_convs.{lvl}.bn", 256)
        sd[f"{nk}.fpn_convs.{lvl}.conv.weight"] = r(256, 256, 3, 3)
        bn(f"{nk}.fpn_convs.{lvl}.bn", 256)

    # ---- vtransform (DepthLSSTransform, in 256, out 80, D=118) -----------
    vt = "encoders.camera.vtransform"
    D = len(np.arange(1.0, 60.0, 0.5))
    for t, (ci, co, k) in zip((0, 3, 6), ((1, 8, 1), (8, 32, 5), (32, 64, 5))):
        sd[f"{vt}.dtransform.{t}.weight"] = r(co, ci, k, k)
        sd[f"{vt}.dtransform.{t}.bias"] = r(co)
        bn(f"{vt}.dtransform.{t + 1}", co)
    for t, (ci, co) in zip((0, 3), ((256 + 64, 256), (256, 256))):
        sd[f"{vt}.depthnet.{t}.weight"] = r(co, ci, 3, 3)
        sd[f"{vt}.depthnet.{t}.bias"] = r(co)
        bn(f"{vt}.depthnet.{t + 1}", co)
    sd[f"{vt}.depthnet.6.weight"] = r(D + 80, 256, 1, 1)
    sd[f"{vt}.depthnet.6.bias"] = r(D + 80)
    for t in (0, 3, 6):
        sd[f"{vt}.downsample.{t}.weight"] = r(80, 80, 3, 3)
        bn(f"{vt}.downsample.{t + 1}", 80)

    # ---- fuser + lidar + decoder + head at reference defaults ------------
    sd["fuser.0.weight"] = r(256, 80 + 256, 3, 3)
    bn("fuser.1", 256)
    eb = "encoders.lidar.backbone"
    ENC_FULL = ((16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    sd[f"{eb}.conv_input.0.weight"] = r(3, 3, 3, 5, 16)
    bn(f"{eb}.conv_input.1", 16)
    for i, chans in enumerate(ENC_FULL):
        layer = f"{eb}.encoder_layers.encoder_layer{i + 1}"
        c = chans[0]
        for j in (0, 1):
            sd[f"{layer}.{j}.conv1.weight"] = r(3, 3, 3, c, c)
            bn(f"{layer}.{j}.bn1", c)
            sd[f"{layer}.{j}.conv2.weight"] = r(3, 3, 3, c, c)
            bn(f"{layer}.{j}.bn2", c)
        if i < 3:
            sd[f"{layer}.2.0.weight"] = r(3, 3, 3, c, chans[-1])
            bn(f"{layer}.2.1", chans[-1])
    sd[f"{eb}.conv_out.0.weight"] = r(1, 1, 3, 128, 128)
    bn(f"{eb}.conv_out.1", 128)
    cin = 256
    for b, co in enumerate((128, 256)):
        for j in range(6):  # 1 lead + 5 layer convs (layer_nums (5,5))
            sd[f"decoder.backbone.blocks.{b}.{3 * j}.weight"] = r(co, cin if j == 0 else co, 3, 3)
            bn(f"decoder.backbone.blocks.{b}.{3 * j + 1}", co)
        cin = co
    sd["decoder.neck.deblocks.0.0.weight"] = r(256, 128, 1, 1)
    bn("decoder.neck.deblocks.0.1", 256)
    sd["decoder.neck.deblocks.1.0.weight"] = r(256, 256, 2, 2)
    bn("decoder.neck.deblocks.1.1", 256)
    hd = "heads.object"
    sd[f"{hd}.shared_conv.weight"] = r(128, 512, 3, 3)
    sd[f"{hd}.shared_conv.bias"] = r(128)
    sd[f"{hd}.heatmap_head.0.conv.weight"] = r(128, 128, 3, 3)
    bn(f"{hd}.heatmap_head.0.bn", 128)
    sd[f"{hd}.heatmap_head.1.weight"] = r(10, 128, 3, 3)
    sd[f"{hd}.heatmap_head.1.bias"] = r(10)
    sd[f"{hd}.class_encoding.weight"] = r(128, 10, 1)
    sd[f"{hd}.class_encoding.bias"] = r(128)
    for pe in ("self_posembed", "cross_posembed"):
        p0 = f"{hd}.decoder.0.{pe}.position_embedding_head"
        sd[f"{p0}.0.weight"] = r(128, 2, 1)
        sd[f"{p0}.0.bias"] = r(128)
        bn(f"{p0}.1", 128)
        sd[f"{p0}.3.weight"] = r(128, 128, 1)
        sd[f"{p0}.3.bias"] = r(128)
    dl = f"{hd}.decoder.0"
    for att in ("self_attn", "multihead_attn"):
        sd[f"{dl}.{att}.in_proj_weight"] = r(3 * 128, 128)
        sd[f"{dl}.{att}.in_proj_bias"] = r(3 * 128)
        sd[f"{dl}.{att}.out_proj.weight"] = r(128, 128)
        sd[f"{dl}.{att}.out_proj.bias"] = r(128)
    sd[f"{dl}.linear1.weight"] = r(256, 128)
    sd[f"{dl}.linear1.bias"] = r(256)
    sd[f"{dl}.linear2.weight"] = r(128, 256)
    sd[f"{dl}.linear2.bias"] = r(128)
    for i in (1, 2, 3):
        sd[f"{dl}.norm{i}.weight"] = r(128)
        sd[f"{dl}.norm{i}.bias"] = r(128)
    for branch, out in (("center", 2), ("height", 1), ("dim", 3), ("rot", 2),
                        ("vel", 2), ("heatmap", 10)):
        pb = f"{hd}.prediction_heads.0.{branch}"
        sd[f"{pb}.0.conv.weight"] = r(64, 128, 1)
        bn(f"{pb}.0.bn", 64)
        sd[f"{pb}.1.weight"] = r(out, 64, 1)
        sd[f"{pb}.1.bias"] = r(out)

    params, stats = convert_bevfusion_state_dict(sd)

    vcfg = VoxelConfig(point_cloud_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 1.0),
                       voxel_size=(0.25, 0.25, 0.1), max_points_in_voxel=5,
                       max_voxel_num=2000)
    model = BEVFusion(voxel_cfg=vcfg, with_camera=True, image_size=(64, 176),
                      voxel_caps=(2000, 1000, 500, 500))
    B, N, iH, iW = 1, 1, 64, 176
    rngs = np.random.RandomState(1)
    batch = {
        "points": jnp.asarray(rngs.uniform(-8, 8, (B, 512, 5)).astype(np.float32)),
        "points_valid": jnp.ones((B, 512), bool),
        "images": jnp.zeros((B, N, iH, iW, 3), jnp.float32),
        "depth_images": jnp.zeros((B, N, iH, iW, 1), jnp.float32),
        "camera2lidar_rots": jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, N, 1, 1)),
        "camera2lidar_trans": jnp.zeros((B, N, 3), jnp.float32),
        "camera_intrinsics": jnp.tile(
            jnp.asarray([[50.0, 0, 88], [0, 50.0, 32], [0, 0, 1]], jnp.float32),
            (B, N, 1, 1)),
        "img_aug_rots": jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, N, 1, 1)),
        "img_aug_trans": jnp.zeros((B, N, 3), jnp.float32),
    }
    init_vars = model.init(jax.random.PRNGKey(0), batch, False)
    got_p, ref_p = flatten_tree(params), flatten_tree(init_vars["params"])
    got_s, ref_s = flatten_tree(stats), flatten_tree(init_vars["batch_stats"])
    assert sorted(got_p) == sorted(ref_p)
    assert sorted(got_s) == sorted(ref_s)
    for k in ref_p:
        assert got_p[k].shape == tuple(ref_p[k].shape), k
    for k in ref_s:
        assert got_s[k].shape == tuple(ref_s[k].shape), k
