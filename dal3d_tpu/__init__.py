"""dal3d_tpu — TPU-native diversity-based active learning for 3D object detection.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Det3D + BEVFusion active-learning stack (``Exploring Diversity-based Active
Learning for 3D Object Detection in Autonomous Driving``, T-ITS 2024).

The package name is the short form of
``exploring-diversity-based-active-learning-for-3d-object-detection-in-autonomous-driving_tpu``.

Layer map (mirrors SURVEY.md L0-L8, re-designed TPU-first):

- ``dal3d_tpu.ops``       fixed-shape device kernels: voxelization, sparse conv
                          (gather-GEMM-scatter over a searchsorted rulebook),
                          rotated IoU / NMS, pairwise distance, k-center FPS.
- ``dal3d_tpu.core``      geometry, box coders, anchors, target assignment.
- ``dal3d_tpu.models``    flax models: readers, SECOND sparse backbone, RPN,
                          multi-group CBGS head, losses, detectors.
- ``dal3d_tpu.data``      nuScenes dataset, pipelines, GT-AUG, CBGS sampling.
- ``dal3d_tpu.selectors`` the 13 active-learning selectors.
- ``dal3d_tpu.solver``    optax optimizer + OneCycle schedules.
- ``dal3d_tpu.runtime``   trainer, hooks, checkpointing.
- ``dal3d_tpu.parallel``  mesh / sharding / collective helpers.
"""

__version__ = "0.1.0"
