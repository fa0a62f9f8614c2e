"""Platform/runtime setup shared by all entry points.

- persistent XLA compilation cache (the remote TPU compile service in some
  environments is slow/flaky; caching makes recompiles of unchanged programs
  instant across processes),
- optional CPU forcing with virtual device count (tests / multichip dry-runs).
"""
from __future__ import annotations

import os


def setup_jax(
    cache_dir: str | None = None,
    force_cpu: bool = False,
    host_device_count: int | None = None,
):
    if host_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={host_device_count}"
            ).strip()
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = cache_dir or os.environ.get(
        "DAL3D_JAX_CACHE", os.path.expanduser("~/.cache/dal3d_jax")
    )
    if force_cpu:
        # separate cache namespace keyed by THIS host's CPU features: CPU
        # executables AOT-compiled on a machine with a different feature set
        # spam machine-mismatch/SIGILL warnings when loaded here (VERDICT
        # r2); a per-feature-set directory means such artifacts are never
        # picked up.
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                flags = next(l for l in f if l.startswith("flags"))
            sig = hashlib.sha1(flags.encode()).hexdigest()[:8]
        except Exception:
            sig = "generic"
        cache = f"{cache}-cpu-{sig}"
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax
