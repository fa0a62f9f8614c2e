from . import box_np_ops, box_ops_jax
from .box_coders import GroundBox3dCoder, build_box_coder
from .anchors import AnchorGeneratorRange, TaskAnchors, build_anchor_generator, generate_task_anchors
from .target_assigner import DeviceTargetAssigner, assign_one_class
from .voxel_generator import VoxelGenerator, points_to_voxel

__all__ = [
    "box_np_ops",
    "box_ops_jax",
    "GroundBox3dCoder",
    "build_box_coder",
    "AnchorGeneratorRange",
    "TaskAnchors",
    "build_anchor_generator",
    "generate_task_anchors",
    "DeviceTargetAssigner",
    "assign_one_class",
    "VoxelGenerator",
    "points_to_voxel",
]
