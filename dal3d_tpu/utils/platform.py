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
        # no persistent cache on forced-CPU runs (an explicit cache_dir is
        # intentionally ignored here too): XLA:CPU AOT entries carry
        # compile-preference pseudo-features (prefer-no-gather/scatter) the
        # host prober never reports, so every cache HIT logs a spurious
        # machine-mismatch/SIGILL warning (VERDICT r2; an upstream cosmetic
        # bug — the per-feature namespace tried first couldn't silence it).
        # CPU compiles here are seconds; the cache only pays off on TPU,
        # where e.g. the 196k top_k costs ~190 s to compile (ROADMAP.md).
        jax.config.update("jax_enable_compilation_cache", False)
        return jax
    cache = cache_dir or os.environ.get(
        "DAL3D_JAX_CACHE", os.path.expanduser("~/.cache/dal3d_jax")
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax
