#!/usr/bin/env python
"""Convert a torch Swin checkpoint (microsoft/timm or mmdet naming; e.g. the
reference's pretrained swint-nuimages) to a flax-param npz consumable by
tools/train_bevfusion.py --swin_init.

Usage: python tools/convert_swin.py swint.pth swint_flax.npz \
           [--depths 2,2,6,2 --out_indices 1,2,3]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flatten(p, prefix=""):
    out = {}
    for k, v in p.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(v)
    return out


def unflatten(flat):
    p = {}
    for k, v in flat.items():
        node = p
        parts = k.split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = v
    return p


def load_swin_npz(path):
    """npz written by this tool -> nested flax param tree."""
    return unflatten(dict(np.load(path)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_npz")
    ap.add_argument("--depths", default="2,2,6,2")
    ap.add_argument("--out_indices", default="1,2,3")
    args = ap.parse_args()

    import torch

    from dal3d_tpu.models.bevfusion.convert_swin import convert_swin_state_dict

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    tree = convert_swin_state_dict(
        sd,
        depths=tuple(int(x) for x in args.depths.split(",")),
        out_indices=tuple(int(x) for x in args.out_indices.split(",")),
    )
    flat = flatten(tree)
    np.savez(args.out_npz, **flat)
    print(f"wrote {len(flat)} arrays to {args.out_npz}")


if __name__ == "__main__":
    main()
