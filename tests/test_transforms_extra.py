"""Tests for the widened mmdet3d pipeline-stage surface
(dal3d_tpu/data/pipelines/transforms_extra.py)."""
import numpy as np

from dal3d_tpu.data.pipelines import transforms_extra as tx


def _lidar_res(points):
    return {"mode": "train", "lidar": {"points": points, "annotations": {}}}


def test_frame_dropout_keeps_current_sweep():
    rng = np.random.RandomState(0)
    pts = np.concatenate([
        np.concatenate([rng.randn(50, 4), np.full((50, 1), t)], 1)
        for t in (0.0, 0.1, 0.2, 0.3)
    ]).astype(np.float32)
    stage = tx.FrameDropout(prob=1.0, time_dim=-1,
                            rng=np.random.RandomState(1))
    res, _ = stage(_lidar_res(pts), {})
    out = res["lidar"]["points"]
    # prob=1 drops every prior sweep; the current sweep always survives
    assert out.shape[0] == 50 and (out[:, -1] == 0).all()
    stage = tx.FrameDropout(prob=0.0, rng=np.random.RandomState(1))
    res, _ = stage(_lidar_res(pts), {})
    assert res["lidar"]["points"].shape[0] == 200


def test_point_sample_counts_and_range():
    rng = np.random.RandomState(0)
    pts = rng.randn(1000, 5).astype(np.float32) * 5
    res, _ = tx.PointSample(256, rng=np.random.RandomState(2))(
        _lidar_res(pts), {})
    assert res["lidar"]["points"].shape == (256, 5)
    # smaller cloud upsamples with replacement
    res, _ = tx.PointSample(64, rng=np.random.RandomState(2))(
        _lidar_res(pts[:10]), {})
    assert res["lidar"]["points"].shape == (64, 5)
    # sample_range: all far points kept
    far = (np.linalg.norm(pts[:, :3], axis=1) > 8.0).sum()
    res, _ = tx.PointSample(600, sample_range=8.0,
                            rng=np.random.RandomState(3))(_lidar_res(pts), {})
    out = res["lidar"]["points"]
    assert out.shape == (600, 5)
    assert (np.linalg.norm(out[:, :3], axis=1) > 8.0).sum() == min(far, 600)


def test_background_points_filter_shell():
    # one box at origin; points inside, in the shell, and far away
    box = np.array([[0, 0, 0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    pts = np.array([
        [0.0, 0.0, 0.5, 1.0],    # inside (z in [0, 2) for origin (.5,.5,0))
        [1.4, 0.0, 0.5, 1.0],    # shell: inside enlarged (w+1), outside box
        [9.0, 9.0, 0.5, 1.0],    # background far away
    ], np.float32)
    res = _lidar_res(pts)
    res["lidar"]["annotations"]["gt_boxes"] = box
    res, _ = tx.BackgroundPointsFilter((1.0, 1.0, 1.0))(res, {})
    out = res["lidar"]["points"]
    assert out.shape[0] == 2
    assert not any(np.allclose(p, pts[1]) for p in out)


def test_voxel_based_point_sampler_caps_per_voxel():
    rng = np.random.RandomState(0)
    # 100 points in ONE voxel (current sweep) + a spread prev sweep
    cur = np.concatenate([rng.rand(100, 3) * 0.05 + 0.5,
                          rng.rand(100, 1), np.zeros((100, 1))], 1)
    prev = np.concatenate([rng.rand(50, 3) * 9, rng.rand(50, 1),
                           np.full((50, 1), 0.1)], 1)
    pts = np.concatenate([cur, prev]).astype(np.float32)
    cfg = dict(voxel_size=(0.5, 0.5, 0.5),
               point_cloud_range=(0, 0, 0, 10, 10, 10),
               max_num_points=5, max_voxels=1000)
    stage = tx.VoxelBasedPointSampler(cfg, prev_sweep_cfg=dict(cfg),
                                      time_dim=4,
                                      rng=np.random.RandomState(1))
    res, _ = stage(_lidar_res(pts), {})
    out = res["lidar"]["points"]
    # the clustered current sweep collapses to <= 5 points
    assert (out[:, 4] == 0).sum() <= 5
    assert out.shape[0] < pts.shape[0] and out.shape[1] == 5


def test_image_pad_fixed_and_divisor():
    img = np.ones((37, 50, 3), np.float32)
    res = {"camera": {"np_images": [img]}}
    out, _ = tx.ImagePad(size=(64, 64))(res, {})
    a = out["camera"]["np_images"][0]
    assert a.shape == (64, 64, 3)
    assert a[:37, :50].min() == 1.0 and a[40:, :].max() == 0.0
    res = {"camera": {"np_images": [img]}}
    out, _ = tx.ImagePad(size_divisor=32)(res, {})
    assert out["camera"]["np_images"][0].shape == (64, 64, 3)


def test_hsv_roundtrip_and_distort():
    rng = np.random.RandomState(0)
    img = rng.rand(16, 16, 3).astype(np.float32) * 255
    h, s, v = tx._rgb_to_hsv(img)
    back = tx._hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(back, img, atol=1e-3)
    res = {"mode": "train", "camera": {"np_images": [img.copy()]}}
    out, _ = tx.ImageDistort(rng=np.random.RandomState(5))(res, {})
    a = out["camera"]["np_images"][0]
    assert a.shape == img.shape and a.dtype == np.float32
    assert a.min() >= 0.0 and a.max() <= 255.0
    # eval mode is a no-op
    res = {"mode": "val", "camera": {"np_images": [img.copy()]}}
    out, _ = tx.ImageDistort(rng=np.random.RandomState(5))(res, {})
    np.testing.assert_array_equal(out["camera"]["np_images"][0], img)


def test_extra_stages_reachable_from_build_pipeline():
    """The widened mmdet3d stages must be constructible from config dicts
    (review r3: they were implemented but not registered)."""
    from dal3d_tpu.data.datasets.nuscenes import build_pipeline

    stages = build_pipeline([
        dict(type="FrameDropout", prob=0.1),
        dict(type="PointSample", num_points=1024),
        dict(type="BackgroundPointsFilter", bbox_enlarge_range=0.2),
        dict(type="VoxelBasedPointSampler", cur_sweep_cfg=dict(
            voxel_size=[0.5, 0.5, 0.5], point_cloud_range=[-10, -10, -5, 10, 10, 3],
            max_num_points=4, max_voxels=2000)),
        dict(type="ImagePad", size_divisor=32),
        dict(type="ImageDistort"),
    ])
    assert len(stages) == 6


def _anno_res(points, boxes, names, post_preprocess=False):
    if post_preprocess:
        anno = {"gt_boxes": boxes, "gt_names": np.asarray(names)}
    else:
        anno = {
            "boxes": boxes,
            "names": np.asarray(names),
            "tokens": np.asarray(["t%d" % i for i in range(len(names))]),
            "velocities": np.zeros((len(names), 3), np.float32),
        }
    return {"mode": "train", "lidar": {"points": points, "annotations": anno}}


def test_global_rot_scale_trans_consistency():
    rng = np.random.RandomState(0)
    pts = rng.randn(200, 5).astype(np.float32) * 5
    boxes = np.zeros((3, 9), np.float32)
    boxes[:, :3] = rng.randn(3, 3) * 4
    boxes[:, 3:6] = 1.0
    p0, b0 = pts.copy(), boxes.copy()
    res = _anno_res(pts, boxes, ["car", "car", "bus"])
    stage = tx.GlobalRotScaleTrans(resize_lim=(1.1, 1.1),
                                   rot_lim=(0.3, 0.3), trans_lim=0.5,
                                   rng=np.random.RandomState(1))
    res, _ = stage(res, {})
    out_p = res["lidar"]["points"]
    out_b = res["lidar"]["annotations"]["boxes"]
    A = res["lidar"]["aug_matrix"]  # row-vector: x' = x @ A.T (flip-free)
    t = res["lidar"]["aug_translation"]
    # points transform: (rot(x) + trans) * scale  ==  x @ A.T + t
    np.testing.assert_allclose(out_p[:, :3], p0[:, :3] @ A.T + t, rtol=1e-4,
                               atol=1e-4)
    # box centers follow the same map; yaw advances by the rotation angle
    np.testing.assert_allclose(out_b[:, :3], b0[:, :3] @ A.T + t, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(out_b[:, -1], b0[:, -1] + 0.3, atol=1e-6)
    # dims scale by 1.1
    np.testing.assert_allclose(out_b[:, 3:6], b0[:, 3:6] * 1.1, rtol=1e-6)
    # eval mode: identity
    res2 = _anno_res(p0.copy(), b0.copy(), ["car", "car", "bus"])
    res2["mode"] = "val"
    res2, _ = stage(res2, {})
    np.testing.assert_array_equal(res2["lidar"]["points"], p0)


def test_random_flip3d_masks_and_matrix():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 5).astype(np.float32)
    boxes = np.zeros((2, 9), np.float32)
    boxes[:, :3] = [[1.0, 2.0, 0.0], [-1.0, -2.0, 0.0]]
    boxes[:, 3:6] = 1.0
    p0, b0 = pts.copy(), boxes.copy()
    mask = np.zeros((2, 8, 6), np.float32)  # [C, Wc(x), Hc(y)]
    mask[:, 0, 0] = 1.0
    res = _anno_res(pts, boxes, ["car", "car"], post_preprocess=True)
    res["gt_masks_bev"] = mask.copy()
    stage = tx.RandomFlip3D(probability=1.0, rng=np.random.RandomState(3))
    res, _ = stage(res, {})
    out_p = res["lidar"]["points"]
    A = res["lidar"]["aug_matrix"]
    # probability=1: both flips fire -> x,y negate
    np.testing.assert_allclose(out_p[:, :2], -p0[:, :2], atol=1e-6)
    np.testing.assert_allclose(p0[:, :3] @ A.T, out_p[:, :3], atol=1e-5)
    # both mask axes reversed
    assert res["gt_masks_bev"][0, -1, -1] == 1.0
    assert res["gt_masks_bev"][0, 0, 0] == 0.0


def test_object_range_filter_parallel_arrays():
    boxes = np.zeros((3, 9), np.float32)
    boxes[:, :2] = [[0.0, 0.0], [100.0, 0.0], [1.0, 1.0]]
    boxes[:, -1] = [0.0, 0.0, 3 * np.pi]  # out-of-period yaw gets limited
    res = _anno_res(np.zeros((4, 5), np.float32), boxes,
                    ["car", "bus", "ped"])
    res, _ = tx.ObjectRangeFilter([-50, -50, -5, 50, 50, 3])(res, {})
    anno = res["lidar"]["annotations"]
    assert anno["boxes"].shape[0] == 2
    assert list(anno["names"]) == ["car", "ped"]
    assert list(anno["tokens"]) == ["t0", "t2"]
    assert anno["velocities"].shape == (2, 3)
    assert -np.pi - 1e-6 <= anno["boxes"][1, -1] < np.pi


def test_points_range_filter_and_name_filter():
    pts = np.array([[0, 0, 0, 1, 0], [99, 0, 0, 1, 0], [0, 0, 99, 1, 0]],
                   np.float32)
    res = _anno_res(pts, np.zeros((2, 9), np.float32), ["car", "cone"])
    res, _ = tx.PointsRangeFilter([-50, -50, -5, 50, 50, 3])(res, {})
    assert res["lidar"]["points"].shape[0] == 1
    res, _ = tx.ObjectNameFilter(["car"])(res, {})
    anno = res["lidar"]["annotations"]
    assert list(anno["names"]) == ["car"] and anno["boxes"].shape[0] == 1


def test_point_shuffle_permutes():
    pts = np.arange(50, dtype=np.float32).reshape(10, 5)
    res = _anno_res(pts.copy(), np.zeros((0, 9), np.float32), [])
    res, _ = tx.PointShuffle(rng=np.random.RandomState(0))(res, {})
    out = res["lidar"]["points"]
    assert not np.array_equal(out, pts)
    assert np.array_equal(np.sort(out[:, 0]), pts[:, 0])


def test_object_noise_moves_points_with_boxes():
    # a single box with points inside; nonzero noise must move box AND points
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0, 0, 0.0]], np.float32)
    rng0 = np.random.RandomState(0)
    inside = rng0.uniform(-0.8, 0.8, size=(30, 2))
    pts = np.concatenate(
        [inside, rng0.uniform(0.1, 1.5, size=(30, 1)),
         np.ones((30, 2))], axis=1).astype(np.float32)
    res = _anno_res(pts.copy(), boxes.copy(), ["car"])
    stage = tx.ObjectNoise(translation_std=(1.0, 1.0, 0.0),
                           rot_range=(-0.5, 0.5),
                           rng=np.random.RandomState(7))
    res, _ = stage(res, {})
    b = res["lidar"]["annotations"]["boxes"]
    p = res["lidar"]["points"]
    moved = np.linalg.norm(b[0, :2] - boxes[0, :2])
    assert moved > 1e-3  # the sole box always accepts a candidate
    # points moved rigidly with the box: relative offsets to center preserved
    d0 = np.linalg.norm(pts[:, :2] - boxes[0, :2], axis=1)
    d1 = np.linalg.norm(p[:, :2] - b[0, :2], axis=1)
    np.testing.assert_allclose(np.sort(d0), np.sort(d1), atol=1e-4)


def test_new_stages_reachable_from_build_pipeline():
    from dal3d_tpu.data.datasets.nuscenes import build_pipeline

    stages = build_pipeline([
        dict(type="GlobalRotScaleTrans", resize_lim=(0.9, 1.1),
             rot_lim=(-0.3, 0.3), trans_lim=0.1, is_train=True),
        dict(type="RandomFlip3D"),
        dict(type="ObjectNoise"),
        dict(type="PointShuffle"),
        dict(type="ObjectRangeFilter", point_cloud_range=[-50, -50, -5, 50, 50, 3]),
        dict(type="PointsRangeFilter", point_cloud_range=[-50, -50, -5, 50, 50, 3]),
        dict(type="ObjectNameFilter", classes=["car"]),
        dict(type="ObjectPaste", db_sampler=dict(db_info_path="/nonexistent.pkl")),
    ])
    assert len(stages) == 8
