"""Full 2-round active-learning loop through the REAL CLIs (no mocks).

Spawns the same entry points train.sh drives, in order, on the synthetic
dataset (reference flow: README.md:34-75, tools/scripts/train.sh):

  create_data synthetic_data_prep                  (dataset + GT db)
  active_select.py            -> buffer init {"0": []}
  active_select.py --force_random                  (round 1: seed select)
  create_data nuscenes_data_prep --suffix B1       (GT-db rebuild for subset)
  train.py --budget B1                             (1 epoch on the subset)
  dist_test.py --checkpoint                        (eval metrics)
  active_select.py --checkpoint                    (round 2: model-based)

and asserts the cross-CLI contracts only an end-to-end run exercises: the
buffer JSON accumulates two cumulative budgets, each round's infos subset
pkl exists and matches the buffer indices, the suffixed GT database was
rebuilt from the selected subset only, training consumed the suffixed infos,
and evaluation produced metrics.
"""
import json
import os
import pickle
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(ws, *argv, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")
    out = subprocess.run(
        [sys.executable] + list(argv), cwd=ws, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    assert out.returncode == 0, (
        f"{argv} failed rc={out.returncode}\n--- stdout ---\n{out.stdout[-3000:]}"
        f"\n--- stderr ---\n{out.stderr[-3000:]}"
    )
    return out


def test_two_round_al_loop_through_clis(tmp_path):
    ws = str(tmp_path)
    cfg_path = os.path.join(ws, "al_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(
            f"""
import sys
sys.path.insert(0, {os.path.join(REPO, 'configs')!r})
from cbgs_entropy_synthetic import *  # noqa: F401,F403

# 1-epoch rounds at smoke scale; budget 1 with the 0.12/frame + 0.04/box
# cost model selects a couple of frames per round (cumulative keys stay
# integers — the buffer contract int()s them)
selector = dict(selector, budget=1)  # noqa: F405
train_epochs = 1
total_epochs = 1
workflow = [("train", 1)]
log_config = dict(interval=1)
"""
        )
    tool = lambda name: os.path.join(REPO, "tools", name)
    data_root = os.path.join(ws, "data", "synthetic")

    # dataset + full-pool GT database (train.sh's one-time prep)
    _run(ws, tool("create_data.py"), "synthetic_data_prep",
         "--root_path", data_root, "--n_frames", "8", "--n_logs", "2")

    buffer_file = os.path.join(ws, "data", "buffers", "synthetic_entropy.json")
    os.makedirs(os.path.dirname(buffer_file), exist_ok=True)

    # round 0: buffer init + exit
    _run(ws, tool("active_select.py"), cfg_path, "--cpu")
    with open(buffer_file) as f:
        buf = json.load(f)
    assert buf == {"0": []}

    # round 1: random seed selection (no model yet)
    _run(ws, tool("active_select.py"), cfg_path, "--cpu", "--force_random")
    with open(buffer_file) as f:
        buf = json.load(f)
    rounds = sorted(int(k) for k in buf)
    assert len(rounds) == 2 and rounds[0] == 0
    b1 = rounds[1]
    assert len(buf[str(b1)]) >= 1

    infos_origin = os.path.join(data_root, "infos_train_10sweeps_withvelo.pkl")
    subset1 = infos_origin.replace(".pkl", f"_{b1}.pkl")
    assert os.path.exists(subset1), "selector must dump the infos subset"
    with open(infos_origin, "rb") as f:
        origin = pickle.load(f)
    with open(subset1, "rb") as f:
        sub1 = pickle.load(f)
    assert [i["token"] for i in sub1] == [origin[i]["token"] for i in buf[str(b1)]]

    # GT-db rebuild restricted to the selected subset (train.sh per-round step)
    _run(ws, tool("create_data.py"), "nuscenes_data_prep",
         "--root_path", data_root, "--nsweeps", "1", "--suffix", str(b1))
    db1 = os.path.join(data_root, f"dbinfos_train_1sweeps_withvelo_{b1}.pkl")
    assert os.path.exists(db1)
    with open(db1, "rb") as f:
        dbinfos = pickle.load(f)
    # suffixed db indexes the SUBSET infos only — image_idx beyond the
    # subset means unselected frames leaked into the GT-AUG database
    n_db = 0
    for cls_infos in dbinfos.values():
        for di in cls_infos:
            assert di["image_idx"] < len(sub1), "GT db leaked unselected frames"
            n_db += 1
    assert n_db >= 1

    # round-1 training on the budget-suffixed infos
    work1 = os.path.join(ws, "work", f"round{b1}")
    out = _run(ws, tool("train.py"), cfg_path, "--cpu", "--budget", str(b1),
               "--work_dir", work1, "--no_validate")
    log = open(os.path.join(work1, "train.log")).read()
    assert f"_{b1}.pkl" in log, "training must consume the suffixed infos"
    assert any(os.scandir(work1)), "checkpoint expected in work_dir"

    # evaluation through the real eval CLI
    dets = os.path.join(ws, "dets.pkl")
    _run(ws, tool("dist_test.py"), cfg_path, "--cpu",
         "--checkpoint", work1, "--work_dir", work1, "--out", dets)
    assert os.path.exists(dets)
    elog = open(os.path.join(work1, "test.log")).read()
    assert "evaluation:" in elog and "mAP" in elog

    # round 2: model-based (Entropy) selection against the round-1 checkpoint
    _run(ws, tool("active_select.py"), cfg_path, "--cpu", "--checkpoint", work1)
    with open(buffer_file) as f:
        buf2 = json.load(f)
    rounds2 = sorted(int(k) for k in buf2)
    assert len(rounds2) == 3, f"two cumulative budgets expected, got {rounds2}"
    b2 = rounds2[2]
    # cumulative: round-2 entry extends round 1, no duplicates
    assert set(buf2[str(b1)]) <= set(buf2[str(b2)])
    assert len(set(buf2[str(b2)])) == len(buf2[str(b2)])
    assert len(buf2[str(b2)]) > len(buf2[str(b1)])
    subset2 = infos_origin.replace(".pkl", f"_{b2}.pkl")
    assert os.path.exists(subset2)
    with open(subset2, "rb") as f:
        sub2 = pickle.load(f)
    assert len(sub2) == len(buf2[str(b2)])
