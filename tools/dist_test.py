#!/usr/bin/env python
"""Evaluation driver (reference tools/dist_test.py:61-186).

The reference distinguishes single-process (test.py) from DDP (dist_test.py)
evaluation; in JAX's single-program model the mesh-sharded predict already
shards frames over every local device, so both CLIs share one body
(runtime/evaluation.run_eval_cli). This entry point is kept for CLI parity.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dal3d_tpu.utils.platform import setup_jax


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a detector (distributed)")
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True, help="work_dir with checkpoints")
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
