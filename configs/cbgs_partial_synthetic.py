"""Partial-label dual-model pipeline on the synthetic CI dataset
(drive/CI twin of cbgs_partial.py)."""
from cbgs_synthetic import *  # noqa: F401,F403

dataset_type = "NuScenesPartialDataset"
sample_ratio = 0.5
active_buffer = "data/buffers/partial_synth.json"
active_flag = "start"
label_fraction = 1.0

selector = dict(  # inherit the synthetic ST selector but exclude the seed set
    **{**selector, "exclude_buffer": active_buffer}  # noqa: F405
)

estimator = dict(type="Estimator", max_pts=64, hidden=(32, 64))
estimator_lr = 0.001
work_dir = "./work_dirs/cbgs_partial_synth"
