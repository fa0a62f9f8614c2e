"""AL experiment: ppal selector (reference counterpart: examples/active/cbgs_ppal.py)."""
from _cbgs_base import *  # noqa: F401,F403

selector = dict(
    type="PPALSelector",
    pred_store_file="data/buffers/ppal_pred.npz",
    diff_file="data/buffers/diff_category_average.json",
    delta=1.5,
    budget=4800,
    buffer_file="data/buffers/ppal.json",
    infos_origin="data/nuScenes/infos_train_10sweeps_withvelo.pkl",
)
work_dir = "./work_dirs/cbgs_ppal"
