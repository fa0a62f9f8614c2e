#!/usr/bin/env bash
# BEVFusion AL-transfer driver (reference README.md:77-130, step 6): consume a
# Det3D-side AL buffer, rebuild the subset infos, then train the lidar-only
# TransFusion-L stage and warm-start the camera+lidar fusion stage from it.
#
# The Det3D-side tools/active_select.py already wrote the selected subset as
# infos_train_*_{budget}.pkl (the byte-compatible buffer contract); this
# driver rebuilds the GT database for that subset and trains both stages.
#
# Usage: ./train_bevfusion.sh <budget> [data_root] [work_root]
set -euo pipefail
BUDGET=${1:?cumulative AL budget (suffix of the selected infos)}
DATA_ROOT=${2:-data/nuScenes}
WORK=${3:-work_dirs/bevfusion_al}

# infos only: the BEVFusion stages train without GT-AUG (db_sampler=None)
python tools/create_data.py nuscenes_data_prep --root_path "$DATA_ROOT" --suffix "$BUDGET" --infos_only
python tools/train_bevfusion.py configs/bevfusion_lidar.py \
  --budget "$BUDGET" --work_dir "$WORK/lidar_$BUDGET"
python tools/train_bevfusion.py configs/bevfusion_cl.py \
  --budget "$BUDGET" --work_dir "$WORK/cl_$BUDGET" \
  --load_from "$WORK/lidar_$BUDGET"
