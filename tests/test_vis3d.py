"""Visualization suite: projection/range math + figure smoke tests."""
import numpy as np

from dal3d_tpu.visualization.vis3d import (
    boxes_to_corners_3d, project_boxes_to_image, range_image,
)
from dal3d_tpu.visualization import detection_gallery, save_bev, save_scene


def test_corners_shape_and_extent():
    boxes = np.array([[1.0, 2.0, 0.5, 2.0, 4.0, 1.5, 0, 0, 0.0]])
    c = boxes_to_corners_3d(boxes)
    assert c.shape == (1, 8, 3)
    np.testing.assert_allclose(c[0].mean(0), [1.0, 2.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(c[0, :, 0].max() - c[0, :, 0].min(), 2.0, atol=1e-6)
    np.testing.assert_allclose(c[0, :, 2].max() - c[0, :, 2].min(), 1.5, atol=1e-6)


def test_project_boxes_center_pixel():
    # camera at lidar origin looking along +x (lidar) == +z (camera):
    # p_lidar = R p_cam with R mapping cam z->lidar x, cam x->lidar -y, cam y->-z
    R = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    t = np.zeros(3)
    K = np.array([[100.0, 0, 320.0], [0, 100.0, 240.0], [0, 0, 1.0]])
    boxes = np.array([[10.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0, 0, 0.0]])  # dead ahead
    uv, front = project_boxes_to_image(boxes, K, R, t)
    assert front.all()
    np.testing.assert_allclose(uv[0].mean(0), [320.0, 240.0], atol=6.0)


def test_range_image_nearest_return():
    pts = np.array([[10.0, 0.0, 0.0], [5.0, 0.0, 0.0]])  # same ray, nearer wins
    img = range_image(pts, shape=(8, 16))
    vals = img[img > 0]
    assert len(vals) == 1 and abs(float(vals[0]) - 5.0) < 1e-5


def test_figures_smoke(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    gt = np.array([[0.0, 0, 0, 2, 4, 1.5, 0, 0, 0.3]])
    p1 = save_bev(str(tmp_path / "bev.png"), pts, gt, pc_range=(-6, -6, 6, 6))
    p2 = save_scene(str(tmp_path / "scene.png"), pts, gt, pred_boxes=gt)
    p3 = detection_gallery(str(tmp_path / "gal.png"),
                           [{"points": pts, "gt_boxes": gt, "title": "f0"}] * 3,
                           pc_range=(-6, -6, 6, 6))
    import os

    assert all(os.path.getsize(p) > 1000 for p in (p1, p2, p3))
