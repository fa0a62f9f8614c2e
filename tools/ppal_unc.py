#!/usr/bin/env python
"""PPAL difficulty-weight pre-pass (reference tools/ppal_unc.py:60-109).

Match pool predictions (pred_list.pkl) to GT over the currently-labeled
subset, compute per-match quality = score^0.6 * scale_iou^0.4, and write the
per-class difficulty weights json consumed by PPALSelector.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--pred_list", default="pred_list.pkl")
    p.add_argument("--out", default="diff_category_average.json")
    p.add_argument("--dist_th", type=float, default=1.0)  # reference classwise_weight/evaluate.py:116
    args = p.parse_args()

    from dal3d_tpu.eval.matched_iou import (
        accumulate_matches, detections_to_frames, infos_to_frames,
        ppal_difficulty_weights,
    )
    from dal3d_tpu.utils import Config
    from dal3d_tpu.utils.fileio import dump, load

    cfg = Config.fromfile(args.config)
    class_names = [n for t in cfg.tasks for n in t["class_names"]]
    sel = dict(cfg.selector)
    infos = load(sel["infos_origin"])
    buffer = load(sel["buffer_file"])
    labeled = buffer[str(max(int(k) for k in buffer))]
    tokens_subset = [infos[i]["token"] for i in labeled]

    with open(args.pred_list, "rb") as f:
        detections = pickle.load(f)
    pred_frames = detections_to_frames(detections, class_names)
    ref_frames = infos_to_frames(infos)
    dict_p_iou = accumulate_matches(ref_frames, pred_frames, class_names, args.dist_th)

    weights = ppal_difficulty_weights(dict_p_iou, tokens_subset)
    # classes with no matches get the maximum difficulty
    import numpy as np

    default_w = 1 + 3.0 * np.log((np.exp(1 / 3.0) - 1) * 1.0 + 1) * 2.0
    for c in class_names:
        weights.setdefault(c, float(default_w))
    dump(weights, args.out)
    with open("dict_p_iou.pkl", "wb") as f:
        pickle.dump(dict_p_iou, f)
    print(f"difficulty weights -> {args.out}: {weights}")


if __name__ == "__main__":
    main()
