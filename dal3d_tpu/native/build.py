"""Build the native host-ops shared library.

Usage: python -m dal3d_tpu.native.build
The library lands next to this file as libdal3d_host.so; the ctypes wrapper
(dal3d_tpu.native.host_ops) falls back to numpy implementations when absent.
"""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "src", "host_ops.cc")
OUT = os.path.join(HERE, "libdal3d_host.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", SRC, "-o", OUT,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    sys.exit(0 if os.path.exists(build()) else 1)
