"""Environment report (reference det3d/torchie/utils/collect_env.py):
versions + device inventory + native-lib status, for bug reports and logs.

Run: ``python -m dal3d_tpu.utils.collect_env``.
"""
from __future__ import annotations

import os
import platform
import sys


def collect_env() -> dict:
    info = {
        "sys.platform": sys.platform,
        "python": sys.version.replace("\n", " "),
        "machine": platform.machine(),
        "JAX_PLATFORMS": os.environ.get("JAX_PLATFORMS", ""),
        "XLA_FLAGS": os.environ.get("XLA_FLAGS", ""),
    }
    try:
        import jax

        info["jax"] = jax.__version__
        try:
            import jaxlib

            info["jaxlib"] = jaxlib.__version__
        except Exception:
            pass
        try:
            info["backend"] = jax.default_backend()
            info["devices"] = ", ".join(str(d) for d in jax.devices())
        except Exception as e:  # backend init can fail (e.g. TPU unreachable)
            info["backend"] = f"unavailable ({type(e).__name__})"
    except ImportError:
        info["jax"] = "not installed"
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy", "torch"):
        try:
            m = __import__(mod)
            for part in mod.split(".")[1:]:
                m = getattr(m, part)
            info[mod] = getattr(m, "__version__", "?")
        except Exception as e:  # broken installs raise OSError/RuntimeError
            info[mod] = f"unavailable ({type(e).__name__})"
    try:
        from ..native import host_ops

        lib = host_ops._load()
        info["native host_ops"] = (
            "unavailable" if lib is None else
            f"loaded ({'mt' if hasattr(lib, 'points_to_voxel_mean_mt') else 'single-thread'} voxelizer)"
        )
    except Exception as e:
        info["native host_ops"] = f"error: {e}"
    return info


def main() -> None:
    for k, v in collect_env().items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
