"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding logic is validated on host CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the reference-free
TPU test strategy in SURVEY.md §4.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Lane rebalance: the fast (default) lane has a <5 min budget (pytest.ini).
# The tests below were MEASURED >= ~9 s each on a 1-core box (2026-08-21,
# full default lane = 34 min; these ~45 tests were 1850 s of it) and are
# exhaustive-oracle/parity runs whose quick siblings stay in the fast lane —
# every module keeps at least one sub-10 s representative. Centralized here
# (instead of per-file marks) so the list can be retuned from one measured
# duration table.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_MEASURED_SLOW = {
    # nodeid prefix (parametrized entries match all params unless a [param]
    # suffix pins one)
    "test_banded.py::test_banded_backbone_matches_brick",
    "test_banded.py::test_banded_chain_matches_oracle_and_brick",
    "test_banded.py::test_banded_subm_conv_matches_oracle",
    "test_banded.py::test_banded_downsample_matches_oracle",
    "test_banded.py::test_grouped_band_plan_exact",
    "test_banded.py::test_oob_count_observable",
    "test_banded.py::test_band_plan_fallback_exact",
    "test_banded.py::test_pallas_kernel_self_tap_matches_xla",
    "test_banded.py::test_spatial_compaction_order_and_set",
    "test_banded.py::test_band_plan_symmetric_consistency",
    "test_brick_plan.py::test_full_pyramid_plan_through_model_forward",
    "test_brick_plan.py::test_planned_pack_through_model_forward",
    "test_brick_plan.py::test_host_plan_capacity_drop_matches_device",
    "test_brick_plan.py::test_host_plan_matches_device_pack[1-False]",
    "test_convert_second.py::test_converted_forward_matches_torch_reference",
    "test_convert_second.py::test_npz_roundtrip_and_state_init",
    "test_convert_bevfusion.py::test_converted_bevfusion_matches_torch_reference",
    "test_bevfusion.py::test_bevfusion_camera_only_forward",
    "test_bevfusion.py::test_bevfusion_host_voxel_feed_matches_device_voxelize",
    "test_bevfusion.py::test_bevfusion_centerpoint_head",
    "test_model_forward.py::test_iou_and_loss_head_variants",
    "test_extras.py::test_image_backbones_forward",
    "test_extras.py::test_point_pillars_forward",
    "test_extras.py::test_points_in_box_pool_and_estimator",
    "test_extras.py::test_iou3d_analytic",
    "test_nms.py::test_fast_iou_matches_clipper",
    "test_transfusion_fidelity.py::test_transfusion_loss_hungarian_iou_cost",
    "test_transfusion_fidelity.py::test_swin_drop_path_train_vs_eval",
    "test_swin_convert.py::test_full_convert_structure_and_forward",
    "test_pallas_iou.py::test_pallas_iou_matches_greens_xla",
    "test_pallas_iou.py::test_coincident_edge_cases",
    "test_pallas_iou.py::test_pallas_iou_matches_exact_reference",
    "test_pallas_iou.py::test_batched_dispatcher_default_is_xla",
    "test_sparse_brick.py::test_gradients_flow",
    "test_sparse_brick.py::test_subm_conv_matches_oracle[4]",
    "test_sparse_brick.py::test_subm_rulebook_reuse_two_convs",
    "test_sparse_brick.py::test_downsample_matches_oracle",
    "test_sparse_brick.py::test_window_rulebook_matches_scalar",
    "test_sparse_brick.py::test_uniform_scatter_scene",
    "test_lsa.py::test_more_rows_than_columns",
    "test_lsa.py::test_matches_scipy_optimal_cost[1]",
    "test_lsa.py::test_matches_scipy_optimal_cost[2]",
    "test_target_assigner.py::test_task_interleaving_matches_reference_layout",
    "test_evaluation.py::test_kitti_style_eval_perfect_detections",
    "test_kitti_eval.py::test_center_head_decode_and_loss",
    "test_sparse_grid.py::test_voxelize_mean_grid_matches_sorted_when_uncapped",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        short = item.nodeid.split("/")[-1]  # "file.py::name[param]"
        base = short.split("[")[0]
        if short in _MEASURED_SLOW or base in _MEASURED_SLOW:
            item.add_marker(pytest.mark.slow)
