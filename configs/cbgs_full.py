"""Full-dataset CBGS baseline — no active learning (reference counterpart:
examples/active/cbgs_full.py — plain VoxelNet / SpMiddleResNetFHD rather than
the FPN variant, trained on the complete labeled set; the upper-bound curve
the AL selectors are compared against)."""
from _cbgs_base import *  # noqa: F401,F403

model = dict(model)  # noqa: F405
model["type"] = "VoxelNet"
model["backbone"] = dict(model["backbone"], type="SpMiddleResNetFHD")

selector = None  # full supervision: no selection round
work_dir = "./work_dirs/cbgs_full"
