#!/usr/bin/env python
"""CALD consistency + JS-divergence pre-pass (reference tools/cald_ent.py:
79-174): match original-input predictions against augmented-input predictions
(the "_cald" evaluator fork role-swap), compute per-frame consistency
min |scale_iou + 0.5*(1-js)*(p+q) - 1.3| and the class-distribution JS
divergence; write cald_ent_sorted_idx.json + idx_to_jsdiv.pkl consumed by
CaldSelector.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--pred_list", default="pred_list.pkl", help="original-input predictions")
    p.add_argument("--pred_list_aug", default="pred_list-aug.pkl", help="augmented-input predictions")
    p.add_argument("--sorted_out", default="cald_ent_sorted_idx.json")
    p.add_argument("--jsdiv_out", default="idx_to_jsdiv.pkl")
    p.add_argument("--dist_th", type=float, default=1.0)  # reference classwise_weight/evaluate.py:116
    args = p.parse_args()

    from dal3d_tpu.eval.matched_iou import (
        accumulate_matches, cald_consistency, class_distribution_jsdiv,
        detections_to_frames,
    )
    from dal3d_tpu.utils import Config
    from dal3d_tpu.utils.fileio import dump, load

    cfg = Config.fromfile(args.config)
    class_names = [n for t in cfg.tasks for n in t["class_names"]]
    sel = dict(cfg.selector)
    infos = load(sel["infos_origin"])
    all_tokens = [i["token"] for i in infos]

    with open(args.pred_list, "rb") as f:
        pred = pickle.load(f)
    with open(args.pred_list_aug, "rb") as f:
        pred_aug = pickle.load(f)
    frames = detections_to_frames(pred, class_names)
    frames_aug = detections_to_frames(pred_aug, class_names)
    # augmented predictions play the reference role (classwise_weight_cald)
    dict_p_iou = accumulate_matches(frames_aug, frames, class_names, args.dist_th)

    cons, order = cald_consistency(dict_p_iou, all_tokens)
    dump(order, args.sorted_out)
    jsdiv = class_distribution_jsdiv(dict_p_iou, all_tokens, class_names)
    with open(args.jsdiv_out, "wb") as f:
        pickle.dump(jsdiv, f)
    print(f"consistency ranking -> {args.sorted_out}; jsdiv -> {args.jsdiv_out}")


if __name__ == "__main__":
    main()
