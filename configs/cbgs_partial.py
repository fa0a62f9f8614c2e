"""Partial-label AL experiment (reference examples/active/cbgs_partial.py):
dual-model training — CBGS detector + box-quality Estimator — on the
partial-label nuScenes variant (runtime.ActiveTrainer)."""
from _cbgs_base import *  # noqa: F401,F403

dataset_type = "NuScenesPartialDataset"
# AL buffer drives the labeled subset (reference cbgs_partial.py:315-316);
# flag "start" seeds partial_01 with sample_ratio of the pool.
sample_ratio = 0.1
active_buffer = "data/buffers/partial_buffer.json"
active_flag = "start"
label_fraction = 1.0  # optional box-level budget extension (1.0 = off)

estimator = dict(type="Estimator", max_pts=128, hidden=(64, 128))
estimator_lr = 0.001

selector = dict(
    type="EntropySelector",
    budget=4800,
    buffer_file="data/buffers/partial.json",
    infos_origin="data/nuScenes/infos_train_10sweeps_withvelo.pkl",
    pred_store_file="data/buffers/partial_pred.npz",
    # the random seed set lives in the DATASET's active_buffer (partial_01);
    # exclude it so selection never re-picks already-labeled frames. Later
    # partial training rounds read buffer keys via active_flag (dataset
    # subsetting), not the --budget subset infos.
    exclude_buffer=active_buffer,
)
work_dir = "./work_dirs/cbgs_partial"
