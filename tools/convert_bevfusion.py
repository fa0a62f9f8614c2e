#!/usr/bin/env python
"""Convert a torch BEVFusion / TransFusion-L checkpoint (.pth) to an npz
loadable by tools/train_bevfusion.py via --torch_init.

The npz stores the RAW state_dict (mmcv checkpoint format: a dict with the
tensors under ``state_dict``); the layout-specific mapping to flax trees
happens at load time (models/bevfusion/convert_bevfusion.py), after
validating it up front here.

Usage: python tools/convert_bevfusion.py ckpt.pth ckpt_flax.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_npz")
    args = ap.parse_args()

    import torch

    from dal3d_tpu.models.bevfusion.convert_bevfusion import (
        convert_bevfusion_state_dict,
    )

    from dal3d_tpu.models.convert_second import count_leaves, save_raw_state_dict_npz

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    params, stats = convert_bevfusion_state_dict(sd)  # raises on unknown layout
    save_raw_state_dict_npz(sd, args.out_npz)
    cam = any(k.startswith("encoders.camera.") for k in sd)
    print(f"wrote {args.out_npz}: {len(sd)} torch tensors -> {count_leaves(params)} params + "
          f"{count_leaves(stats)} batch_stats leaves (validated; camera branch: {cam})")


if __name__ == "__main__":
    main()
