#!/usr/bin/env python
"""Single-process evaluation driver (reference tools/test.py).

Shards val frames over the device mesh via the batched predict step, gathers
per-frame detections, and runs dataset.evaluation (nuScenes devkit when
available; otherwise writes the submission json). The body is shared with
tools/dist_test.py (runtime/evaluation.run_eval_cli) — the reference's
single-vs-DDP split collapses in JAX's single-program model.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a detector")
    p.add_argument("config")
    p.add_argument("--checkpoint", help="work_dir with checkpoints")
    p.add_argument("--torch_init", help="npz from tools/convert_second.py "
                   "(evaluate a converted reference checkpoint)")
    p.add_argument("--out", help="pkl file to dump raw detections")
    p.add_argument("--work_dir", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--testset", action="store_true")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    setup_jax(force_cpu=args.cpu)

    from dal3d_tpu.runtime.evaluation import run_eval_cli

    run_eval_cli(args)


if __name__ == "__main__":
    main()
