#!/usr/bin/env python
"""Convert a torch det3d CBGS VoxelNet checkpoint (.pth) to an npz loadable
by tools/train.py / tools/test.py via --torch_init.

The npz stores the RAW state_dict (torchie save_checkpoint format, reference
det3d/torchie/trainer/checkpoint.py:121-190); the engine-layout-specific
mapping to flax trees happens at load time
(dal3d_tpu.models.convert_second.load_torch_detector_npz), so one file
serves every backbone engine.

Usage: python tools/convert_second.py ckpt.pth ckpt_flax.npz
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

    from dal3d_tpu.models.convert_second import convert_second_state_dict

    from dal3d_tpu.models.convert_second import count_leaves, save_raw_state_dict_npz

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    # validate the mapping up front (raises on unknown layout)
    params, stats = convert_second_state_dict(sd, nested_l0=True)
    save_raw_state_dict_npz(sd, args.out_npz)
    print(f"wrote {args.out_npz}: {len(sd)} torch tensors -> "
          f"{count_leaves(params)} params + {count_leaves(stats)} batch_stats leaves (validated)")


if __name__ == "__main__":
    main()
