"""Entropy (model-based) selector on the synthetic dataset — the CI config
for the full AL loop with a model in the loop (train.sh seed round ->
checkpointed selection rounds)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from cbgs_synthetic import *  # noqa: F401,F403

selector = dict(
    type="EntropySelector",
    budget=3,
    buffer_file="data/buffers/synthetic_entropy.json",
    infos_origin="data/synthetic/infos_train_10sweeps_withvelo.pkl",
    score_store_file="data/buffers/synthetic_entropy_scores.npy",
)
work_dir = "./work_dirs/cbgs_entropy_synthetic"
