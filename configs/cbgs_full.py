"""Full-dataset CBGS baseline — no active learning (reference counterpart:
examples/active/cbgs_full.py — plain VoxelNet / SpMiddleResNetFHD rather than
the FPN variant, trained on the complete labeled set; the upper-bound curve
the AL selectors are compared against)."""
from _cbgs_base import *  # noqa: F401,F403

model = dict(model)  # noqa: F405
model["type"] = "VoxelNet"
# the non-FPN SpMiddleResNetFHD differs from the FPN variant only in not
# returning intermediate maps; our builder selects that via the detector type
# (VoxelNet = return_middle False), so no backbone-type override is needed

selector = None  # full supervision: no selection round
work_dir = "./work_dirs/cbgs_full"
