"""nuScenes info creation from the raw dataset (devkit required).

Schema parity with det3d/datasets/nuscenes/nusc_common.py:372-535
(``_fill_trainval_infos``) / :625-698 (``create_nuscenes_infos``) — see
SURVEY.md A.1: per keyframe {lidar_path, cam_front_path, token, sweeps (<=9
prior sweeps with transform_matrix + time_lag, last duplicated on short
scenes), ref_from_car, car_from_global, timestamp; train: gt_boxes [N,9]
(x,y,z,w,l,h,vx,vy,yaw), gt_boxes_velocity, gt_names (detection-mapped),
gt_boxes_token}. Untestable without the dataset in this environment; the
synthetic generator mirrors the same schema for CI.
"""
from __future__ import annotations

import os
import pickle
from typing import List

import numpy as np

from .datasets.nuscenes import general_to_detection


def _get_available_scenes(nusc):
    available = []
    for scene in nusc.scene:
        token = scene["token"]
        rec = nusc.get("sample", scene["first_sample_token"])
        sd = nusc.get("sample_data", rec["data"]["LIDAR_TOP"])
        lidar_path, _, _ = nusc.get_sample_data(sd["token"])
        if os.path.exists(str(lidar_path)):
            available.append(scene)
    return available


def _transform_matrix(translation, rotation_q, inverse=False):
    from pyquaternion import Quaternion

    tm = np.eye(4)
    rot = Quaternion(rotation_q).rotation_matrix
    if inverse:
        tm[:3, :3] = rot.T
        tm[:3, 3] = rot.T @ (-np.asarray(translation))
    else:
        tm[:3, :3] = rot
        tm[:3, 3] = np.asarray(translation)
    return tm


def _fill_trainval_infos(nusc, train_scenes, test: bool = False, nsweeps: int = 10):
    from pyquaternion import Quaternion

    train_infos, val_infos = [], []
    ref_chan = "LIDAR_TOP"

    for sample in nusc.sample:
        ref_sd_token = sample["data"][ref_chan]
        ref_sd = nusc.get("sample_data", ref_sd_token)
        ref_cs = nusc.get("calibrated_sensor", ref_sd["calibrated_sensor_token"])
        ref_pose = nusc.get("ego_pose", ref_sd["ego_pose_token"])
        ref_time = 1e-6 * ref_sd["timestamp"]
        ref_lidar_path, ref_boxes, _ = nusc.get_sample_data(ref_sd_token)

        ref_from_car = _transform_matrix(ref_cs["translation"], ref_cs["rotation"], inverse=True)
        car_from_global = _transform_matrix(ref_pose["translation"], ref_pose["rotation"], inverse=True)

        cam_token = sample["data"]["CAM_FRONT"]
        cam_path, _, _ = nusc.get_sample_data(cam_token)

        info = {
            "lidar_path": str(ref_lidar_path),
            "cam_front_path": str(cam_path),
            "token": sample["token"],
            "sweeps": [],
            "ref_from_car": ref_from_car,
            "car_from_global": car_from_global,
            "timestamp": ref_time,
        }

        # accumulate <= nsweeps-1 prior sweeps, transformed into the ref frame
        sample_data_token = ref_sd_token
        curr_sd = ref_sd
        sweeps = []
        while len(sweeps) < nsweeps - 1:
            if curr_sd["prev"] == "":
                if len(sweeps) == 0:
                    sweeps.append({
                        "lidar_path": str(ref_lidar_path),
                        "sample_data_token": curr_sd["token"],
                        "transform_matrix": None,
                        "time_lag": 0.0,
                    })
                else:
                    sweeps.append(sweeps[-1])  # duplicate last (short scenes)
            else:
                curr_sd = nusc.get("sample_data", curr_sd["prev"])
                cs = nusc.get("calibrated_sensor", curr_sd["calibrated_sensor_token"])
                pose = nusc.get("ego_pose", curr_sd["ego_pose_token"])
                global_from_car = _transform_matrix(pose["translation"], pose["rotation"], inverse=False)
                car_from_current = _transform_matrix(cs["translation"], cs["rotation"], inverse=False)
                tm = ref_from_car @ car_from_global @ global_from_car @ car_from_current
                lidar_path = os.path.join(nusc.dataroot, curr_sd["filename"])
                sweeps.append({
                    "lidar_path": str(lidar_path),
                    "sample_data_token": curr_sd["token"],
                    "transform_matrix": tm,
                    "time_lag": ref_time - 1e-6 * curr_sd["timestamp"],
                })
        info["sweeps"] = sweeps

        if not test:
            annotations = [nusc.get("sample_annotation", t) for t in sample["anns"]]
            locs = np.array([b.center for b in ref_boxes]).reshape(-1, 3)
            dims = np.array([b.wlh for b in ref_boxes]).reshape(-1, 3)
            rots = np.array([b.orientation.yaw_pitch_roll[0] for b in ref_boxes]).reshape(-1, 1)
            velocity = np.array([nusc.box_velocity(t)[:2] for t in sample["anns"]]).reshape(-1, 2)
            names = np.array([general_to_detection.get(b.name, "ignore") for b in ref_boxes])
            tokens = np.array([b.token for b in ref_boxes])
            # rotate velocity into the sensor frame
            for i in range(len(ref_boxes)):
                velo = np.array([*velocity[i], 0.0])
                velo = car_from_global[:3, :3] @ velo
                velo = ref_from_car[:3, :3] @ velo
                velocity[i] = velo[:2]
            # storage yaw convention: -yaw - pi/2 (inverse of submission transform)
            gt_boxes = np.concatenate(
                [locs, dims, velocity, -rots - np.pi / 2], axis=1
            ).astype(np.float32)
            info["gt_boxes"] = gt_boxes
            info["gt_boxes_velocity"] = np.concatenate(
                [velocity, np.zeros((len(ref_boxes), 1))], axis=1
            ).astype(np.float32)
            info["gt_names"] = names
            info["gt_boxes_token"] = tokens

        if sample["scene_token"] in train_scenes:
            train_infos.append(info)
        else:
            val_infos.append(info)
    return train_infos, val_infos


def create_nuscenes_infos(root_path: str, version: str = "v1.0-trainval", nsweeps: int = 10):
    from nuscenes import NuScenes
    from nuscenes.utils import splits

    nusc = NuScenes(version=version, dataroot=root_path, verbose=True)
    if version == "v1.0-trainval":
        train_names, val_names = splits.train, splits.val
    elif version == "v1.0-mini":
        train_names, val_names = splits.mini_train, splits.mini_val
    elif version == "v1.0-test":
        train_names, val_names = splits.test, []
    else:
        raise ValueError(version)
    available = _get_available_scenes(nusc)
    name_to_token = {s["name"]: s["token"] for s in available}
    train_scenes = {name_to_token[n] for n in train_names if n in name_to_token}

    test = version == "v1.0-test"
    train_infos, val_infos = _fill_trainval_infos(nusc, train_scenes, test=test, nsweeps=nsweeps)
    if test:
        with open(os.path.join(root_path, f"infos_test_{nsweeps}sweeps_withvelo.pkl"), "wb") as f:
            pickle.dump(train_infos, f)
    else:
        with open(os.path.join(root_path, f"infos_train_{nsweeps}sweeps_withvelo.pkl"), "wb") as f:
            pickle.dump(train_infos, f)
        with open(os.path.join(root_path, f"infos_val_{nsweeps}sweeps_withvelo.pkl"), "wb") as f:
            pickle.dump(val_infos, f)
