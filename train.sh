#!/usr/bin/env bash
# Active-learning round driver (reference train.sh + tools/scripts/train.sh):
# for each cumulative budget: select -> rebuild GT db for the subset -> train -> eval.
#
# Round 1 selects the seed buffer with RandomSelector (no model exists yet);
# later rounds run the configured selector against the previous round's
# checkpoint — the reference flow trains on a random seed buffer before the
# first model-based selection (reference README.md:34-75).
#
# Usage: ./train.sh <config> <work_root> <budget_step> <rounds> [data_root]
set -euo pipefail
CONFIG=${1:?config}
WORK=${2:-work_dirs/al}
STEP=${3:-600}
ROUNDS=${4:-8}
DATA_ROOT=${5:-data/nuScenes}

python tools/active_select.py "$CONFIG"   # round 0: init buffer {"0": []}
for ((r=1; r<=ROUNDS; r++)); do
  BUDGET=$((STEP * r))
  echo "=== AL round $r (cumulative budget $BUDGET) ==="
  if (( r > 1 )); then
    PREV=$((STEP * (r-1)))
    python tools/active_select.py "$CONFIG" --checkpoint "$WORK/round$PREV"
  else
    python tools/active_select.py "$CONFIG" --force_random  # seed round
  fi
  python tools/create_data.py nuscenes_data_prep --root_path "$DATA_ROOT" --suffix "$BUDGET"
  python tools/train.py "$CONFIG" --budget "$BUDGET" --work_dir "$WORK/round$BUDGET"
  python tools/dist_test.py "$CONFIG" --checkpoint "$WORK/round$BUDGET" --work_dir "$WORK/round$BUDGET"
done
