"""Camera pipeline: ImageAug3D affine oracle, depth-raster/geometry
round-trip, GridMask, and the synthetic multi-view end-to-end path into the
BEVFusion camera+lidar forward."""
import numpy as np
import pytest

from dal3d_tpu.data.pipelines.camera import (
    GridMask, ImageAug3D, ImageNormalize, LoadMultiViewImages, ReformatCamera,
    rasterize_depth,
)


def _delta_image(H, W, v, u):
    from PIL import Image

    a = np.zeros((H, W, 3), np.uint8)
    a[v, u] = 255
    return Image.fromarray(a)


def test_imageaug3d_affine_tracks_pixel():
    """The white pixel must land where aug_rot @ p + aug_trans says."""
    H, W = 64, 96
    v, u = 40, 60
    for seed in range(4):
        rng = np.random.RandomState(seed)
        aug = ImageAug3D(final_dim=(32, 48), resize_lim=(0.6, 0.9),
                         bot_pct_lim=(0.0, 0.2), rot_lim=(-15.0, 15.0),
                         rand_flip=True, rng=rng)
        res = {
            "mode": "train",
            "camera": {
                "pil_images": [_delta_image(H, W, v, u)],
                "aug_rots": [np.eye(2)], "aug_trans": [np.zeros(2)],
            },
        }
        res, _ = aug(res, {})
        out = np.asarray(res["camera"]["pil_images"][0], np.float32).sum(-1)
        R, t = res["camera"]["aug_rots"][0], res["camera"]["aug_trans"][0]
        pred = R @ np.array([u, v], np.float64) + t
        if out.max() < 1:  # pixel cropped/rotated out of frame — predicted too
            fH, fW = 32, 48
            assert not (0 <= pred[0] < fW and 2 <= pred[1] < fH - 2), (
                f"seed {seed}: pixel vanished but predicted in-frame at {pred}"
            )
            continue
        vv, uu = np.unravel_index(np.argmax(out), out.shape)
        err = np.hypot(uu - pred[0], vv - pred[1])
        assert err < 2.5, f"seed {seed}: affine says {pred}, pixel at {(uu, vv)}"


def test_depth_raster_geometry_roundtrip():
    """rasterize_depth then get_geometry must reproduce the lidar point."""
    import jax.numpy as jnp

    from dal3d_tpu.models.bevfusion.vtransforms import create_frustum, get_geometry

    fH, fW = 32, 48
    K = np.array([[50.0, 0, fW / 2], [0, 50.0, fH / 2], [0, 0, 1]], np.float32)
    R = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], np.float32)
    t = np.array([0.0, 0.0, 1.6], np.float32)
    pt = np.array([[6.0, 0.4, 1.2]], np.float32)  # in front of the camera
    aug_R, aug_t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)

    depth = rasterize_depth(pt, K, R, t, aug_R, aug_t, fH, fW)
    assert (depth > 0).sum() == 1
    v, u = np.argwhere(depth[..., 0] > 0)[0]
    d = float(depth[v, u, 0])

    # frustum cell at that pixel/depth -> lidar xyz
    dbound = (1.0, 10.0, 0.5)
    fr = create_frustum((fH, fW), (fH, fW), dbound)  # no downsample
    geom = get_geometry(
        jnp.asarray(fr),
        jnp.asarray(R)[None, None], jnp.asarray(t)[None, None],
        jnp.asarray(K)[None, None],
        jnp.asarray(aug_R)[None, None], jnp.asarray(aug_t)[None, None],
    )
    di = int(round((d - dbound[0]) / dbound[2]))
    rec = np.asarray(geom[0, 0, di, v, u])
    # quantization: pixel rounding + depth-bin snap
    assert np.abs(rec - pt[0]).max() < 0.35, f"roundtrip {rec} vs {pt[0]}"


def test_gridmask_masks_pixels():
    rng = np.random.RandomState(0)
    gm = GridMask(prob=1.0, ratio=0.5, rotate=1, mode=1, rng=rng)
    img = np.full((32, 48, 3), 200, np.uint8)
    from PIL import Image

    res = {"mode": "train", "camera": {"pil_images": [Image.fromarray(img)]}}
    res, _ = gm(res, {})
    out = res["camera"]["np_images"][0]
    frac = (out.sum(-1) == 0).mean()
    assert 0.1 < frac < 0.9, f"masked fraction {frac}"


@pytest.fixture(scope="module")
def cam_dataset(tmp_path_factory):
    from dal3d_tpu.data.datasets.synthetic import make_synthetic_nuscenes

    root = str(tmp_path_factory.mktemp("nusc_cam"))
    info_path = make_synthetic_nuscenes(
        root, n_frames=4, n_logs=1, points_per_frame=2000, seed=0,
        range_xy=7.0, with_camera=True, image_hw=(64, 96),
    )
    return root, info_path


@pytest.mark.slow
def test_camera_pipeline_end_to_end(cam_dataset):
    """Dataset + camera stages -> fixed-shape batch -> BEVFusion fusion forward."""
    import jax
    import jax.numpy as jnp

    from dal3d_tpu.data import DataLoader, NuScenesDataset
    from dal3d_tpu.models.bevfusion import BEVFusion
    from dal3d_tpu.ops.voxelize import VoxelConfig

    root, info_path = cam_dataset
    classes = ["car", "pedestrian", "traffic_cone"]
    pipeline = [
        dict(type="LoadPointCloudFromFile", dataset="NuScenesDataset"),
        dict(type="LoadPointCloudAnnotations", with_bbox=True),
        dict(type="LoadMultiViewImages"),
        dict(type="Preprocess", cfg=dict(
            mode="train", shuffle_points=False,
            global_rot_noise=[-0.4, 0.4], global_scale_noise=[0.9, 1.1],
            db_sampler=None, class_names=classes,
        )),
        dict(type="ImageAug3D", final_dim=(32, 48), resize_lim=(0.48, 0.52),
             bot_pct_lim=(0.0, 0.0), rot_lim=(-5.0, 5.0), rand_flip=True),
        dict(type="GridMask", prob=1.0, ratio=0.4),
        dict(type="ImageNormalize"),
        dict(type="ReformatCamera", final_dim=(32, 48)),
        dict(type="ReformatFixedShape", max_gt=16),
    ]
    ds = NuScenesDataset(
        info_path=info_path, root_path=root, nsweeps=1, class_names=classes,
        pipeline=pipeline, tasks=[dict(num_class=3, class_names=classes)],
        max_points=4096,
    )
    batch = next(iter(DataLoader(ds, batch_size=2, shuffle=False)))
    assert batch["images"].shape == (2, 6, 32, 48, 3)
    assert batch["depth_images"].shape == (2, 6, 32, 48, 1)
    assert batch["camera_intrinsics"].shape == (2, 6, 3, 3)
    assert batch["img_aug_rots"].shape == (2, 6, 3, 3)
    # lidar points were rasterized into at least one camera
    assert (batch["depth_images"] > 0).sum() > 100

    model = BEVFusion(
        voxel_cfg=VoxelConfig((-8.0, -8.0, -3.0, 8.0, 8.0, 1.0),
                              (0.25, 0.25, 0.1), 5, 2000),
        with_camera=True, num_proposals=8, num_classes=3,
        decoder_channels=(32, 64), voxel_caps=(2000, 1000, 500, 500),
        image_size=(32, 48), camera_out_channels=16,
    )
    mb = {k: jnp.asarray(v) for k, v in batch.items()
          if k not in ("gt_boxes", "gt_classes", "metadata")}
    var = model.init(jax.random.PRNGKey(0), mb, False)
    preds = model.apply(var, mb, False)
    assert preds["cls_logits"].shape == (2, 8, 3)
    assert np.isfinite(np.asarray(preds["cls_logits"])).all()
