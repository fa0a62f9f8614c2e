#!/usr/bin/env python
"""Data preparation CLI (reference tools/create_data.py:21-49).

- ``nuscenes_data_prep``: build the 10-sweep info pkls (requires the nuScenes
  devkit + raw dataset) and/or the GT database; with ``--suffix`` (the AL
  cumulative budget) the GT database is rebuilt from the selected infos subset
  so GT-AUG only pastes labeled objects.
- ``synthetic_data_prep``: generate the synthetic nuScenes-schema dataset for
  development/CI (no devkit needed).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def nuscenes_data_prep(root_path, version="v1.0-trainval", nsweeps=10, suffix=None, infos_only=False):
    from dal3d_tpu.data.create_gt_database import create_groundtruth_database

    if suffix is None and not os.path.exists(
        os.path.join(root_path, f"infos_train_{nsweeps}sweeps_withvelo.pkl")
    ):
        from dal3d_tpu.data.nusc_common import create_nuscenes_infos

        create_nuscenes_infos(root_path, version=version, nsweeps=nsweeps)
    if infos_only:
        return
    info_name = f"infos_train_{nsweeps}sweeps_withvelo" + (f"_{suffix}" if suffix else "")
    create_groundtruth_database(
        root_path,
        os.path.join(root_path, info_name + ".pkl"),
        nsweeps=nsweeps,
        suffix=suffix,
    )


def synthetic_data_prep(root_path, n_frames=32, n_logs=4, seed=0, range_xy=45.0, with_camera=False):
    from dal3d_tpu.data.create_gt_database import create_groundtruth_database
    from dal3d_tpu.data.datasets.synthetic import make_synthetic_nuscenes
    from dal3d_tpu.utils.fileio import dump

    train = make_synthetic_nuscenes(root_path, n_frames, n_logs, seed=seed, split="train", range_xy=range_xy, with_camera=with_camera)
    make_synthetic_nuscenes(root_path, max(n_frames // 4, 2), n_logs, seed=seed + 1, split="val", range_xy=range_xy, with_camera=with_camera)
    # minimal log.json for the spatial selectors
    from dal3d_tpu.utils.fileio import load

    infos = load(train)
    logfiles = sorted({i["cam_front_path"].split("/")[-1].split("__")[0] for i in infos})
    os.makedirs(os.path.join(root_path, "v1.0-trainval"), exist_ok=True)
    dump(
        [{"logfile": lf, "location": "singapore-onenorth"} for lf in logfiles],
        os.path.join(root_path, "v1.0-trainval", "log.json"),
    )
    create_groundtruth_database(root_path, train, nsweeps=1)
    print(f"synthetic dataset at {root_path}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    n = sub.add_parser("nuscenes_data_prep")
    n.add_argument("--root_path", required=True)
    n.add_argument("--version", default="v1.0-trainval")
    n.add_argument("--nsweeps", type=int, default=10)
    n.add_argument("--suffix", default=None, help="AL cumulative budget")
    n.add_argument("--infos_only", action="store_true")
    s = sub.add_parser("synthetic_data_prep")
    s.add_argument("--root_path", required=True)
    s.add_argument("--n_frames", type=int, default=32)
    s.add_argument("--n_logs", type=int, default=4)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--range_xy", type=float, default=45.0)
    s.add_argument("--with_camera", action="store_true")
    args = p.parse_args()
    if args.cmd == "nuscenes_data_prep":
        nuscenes_data_prep(args.root_path, args.version, args.nsweeps, args.suffix, args.infos_only)
    else:
        synthetic_data_prep(args.root_path, args.n_frames, args.n_logs, args.seed, args.range_xy, args.with_camera)


if __name__ == "__main__":
    main()
