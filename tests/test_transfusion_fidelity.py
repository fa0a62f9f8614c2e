"""TransFusion training fidelity vs tiny numpy oracles (VERDICT round-1
items 3/4): gaussian-radius heatmap targets, the full Hungarian matching
cost, and Swin stochastic depth."""
import numpy as np
import jax
import jax.numpy as jnp

from dal3d_tpu.models.bevfusion.gaussian import (
    draw_gaussian_heatmap, gaussian_focal_loss, gaussian_radius,
)


def _oracle_radius(height, width, min_overlap):
    """Straight transcription of the reference formula for the test oracle
    (bevfusion/mmdet3d/core/utils/gaussian.py:55-84)."""
    a1, b1 = 1, height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(b1 ** 2 - 4 * a1 * c1)) / 2
    a2, b2 = 4, 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + np.sqrt(b2 ** 2 - 4 * a2 * c2)) / 2
    a3, b3 = 4 * min_overlap, -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + np.sqrt(b3 ** 2 - 4 * a3 * c3)) / 2
    return min(r1, r2, r3)


def _oracle_draw(hm, cx, cy, radius):
    """Reference draw_heatmap_gaussian (gaussian.py:24-52), numpy."""
    diameter = 2 * radius + 1
    sigma = diameter / 6
    m = (diameter - 1.0) / 2.0
    y, x = np.ogrid[-m: m + 1, -m: m + 1]
    g = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    g[g < np.finfo(g.dtype).eps * g.max()] = 0
    H, W = hm.shape
    x0, y0 = int(cx), int(cy)
    left, right = min(x0, radius), min(W - x0, radius + 1)
    top, bottom = min(y0, radius), min(H - y0, radius + 1)
    patch = g[radius - top: radius + bottom, radius - left: radius + right]
    hm[y0 - top: y0 + bottom, x0 - left: x0 + right] = np.maximum(
        hm[y0 - top: y0 + bottom, x0 - left: x0 + right], patch
    )
    return hm


def test_gaussian_radius_matches_reference_formula():
    for l, w, ov in [(7.7, 3.3, 0.1), (12.0, 5.0, 0.1), (3.0, 3.0, 0.5)]:
        got = float(gaussian_radius(jnp.asarray(l), jnp.asarray(w), ov))
        assert abs(got - _oracle_radius(l, w, ov)) < 1e-4


def test_draw_heatmap_matches_reference_draw():
    H = W = 32
    nc = 2
    centers = np.array([[[10.3, 12.7], [25.0, 5.0], [3.0, 29.0]]])
    radii = np.array([[3, 2, 4]])
    classes = np.array([[0, 1, 0]])
    valid = np.array([[True, True, True]])
    got = np.asarray(draw_gaussian_heatmap(
        jnp.asarray(centers, jnp.float32), jnp.asarray(radii), jnp.asarray(classes),
        jnp.asarray(valid), H, W, nc,
    ))[0]
    oracle = np.zeros((H, W, nc))
    for (cx, cy), r, c in zip(centers[0], radii[0], classes[0]):
        oracle[:, :, c] = _oracle_draw(oracle[:, :, c], cx, cy, int(r))
    # the fixed-window version doesn't zero sub-eps tails; compare above eps
    np.testing.assert_allclose(got, oracle, atol=1e-6)


def test_gaussian_focal_loss_penalty_reduction():
    """Negatives near a gaussian peak are penalized less than far negatives."""
    logits = jnp.full((1, 4, 1), 2.0)  # confident positives everywhere
    target = jnp.asarray([[[1.0], [0.8], [0.2], [0.0]]])
    loss = np.asarray(gaussian_focal_loss(logits, target))[0, :, 0]
    assert loss[1] < loss[2] < loss[3]  # (1-t)^4 damping
    assert loss[0] < loss[3]  # true positive cheap for confident pred


def test_transfusion_loss_hungarian_iou_cost():
    """The IoU term must steer assignment: two proposals with equal class
    prob and center distance, one with matching size -> it wins the match."""
    from dal3d_tpu.models.bevfusion.transfusion import (
        TransFusionTestCfg, transfusion_loss,
    )

    cfg = TransFusionTestCfg(out_size_factor=8, voxel_size=(0.25, 0.25),
                             pc_range=(-8.0, -8.0))
    B, P, nc = 1, 2, 3
    # craft preds whose decode puts both proposals at the gt center; sizes
    # differ: proposal 0 exact, proposal 1 double volume
    gt = jnp.asarray([[[0.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0, 0, 0.0]]])
    gcls = jnp.asarray([[1]])
    grid_xy = (0.0 - cfg.pc_range[0]) / (cfg.out_size_factor * cfg.voxel_size[0])
    preds = {
        "center": jnp.asarray([[[grid_xy, grid_xy], [grid_xy, grid_xy]]]),
        "height": jnp.zeros((B, P, 1)),
        "dim": jnp.log(jnp.asarray([[[2.0, 4.0, 1.5], [4.0, 8.0, 1.5]]])),
        "rot": jnp.tile(jnp.asarray([1.0, 0.0]), (B, P, 1)),
        "vel": jnp.zeros((B, P, 2)),
        "cls_logits": jnp.zeros((B, P, nc)),
        "heatmap": jnp.zeros((B, 8, 8, nc)),
        "query_labels": jnp.zeros((B, P), jnp.int32),
        "query_score": jnp.ones((B, P)),
    }
    logs = transfusion_loss(preds, gt, gcls, cfg)
    assert int(logs["num_matched"]) == 1
    # matched proposal must be #0 (higher IoU): its reg loss is ~0
    assert float(logs["reg_loss"]) < 1e-3


def test_swin_drop_path_train_vs_eval():
    from dal3d_tpu.models.bevfusion.swin import SwinTransformer

    model = SwinTransformer(embed_dim=24, depths=(1, 1), num_heads=(2, 4),
                            out_indices=(0, 1), drop_path_rate=0.5)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 32, 32, 3), jnp.float32)
    var = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    eval_out = model.apply(var, x, False)
    e2 = model.apply(var, x, False)
    np.testing.assert_allclose(np.asarray(eval_out[0]), np.asarray(e2[0]))  # deterministic
    t1 = model.apply(var, x, True, rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = model.apply(var, x, True, rngs={"dropout": jax.random.PRNGKey(2)})
    # stage 0's block has drop-path rate 0 (linear ramp); stage 1's is 0.9
    assert not np.allclose(np.asarray(t1[1]), np.asarray(t2[1]))  # stochastic
