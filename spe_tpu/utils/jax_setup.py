"""Process-wide JAX configuration for SPE-TPU.

Call `setup()` once at entry (drivers, bench, tests do this). Centralizes:
  * persistent compilation cache — the axon remote-compile service has
    extremely noisy latency (39s..440s measured for the same graph); the
    cache makes repeat runs pay ~seconds instead;
  * optional platform override for CPU-only work.
"""

from __future__ import annotations

import os
import pathlib


def setup(platform: str | None = None, cache_dir: str | None = None) -> None:
    import jax

    # SPE_TPU_PLATFORM=cpu forces the platform from the environment (needed
    # because the axon sitecustomize pins jax_platforms via jax.config,
    # which silently overrides JAX_PLATFORMS in subprocesses)
    platform = platform or os.environ.get("SPE_TPU_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if cache_dir is None:
        root = pathlib.Path(__file__).resolve().parents[2]
        cache_dir = os.environ.get("SPE_TPU_JAX_CACHE", str(root / ".jax_cache"))
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # 0.3s: low enough that eager per-op compiles (~0.5s each on the 1-core
    # CI box; un-jitted flax init dispatches hundreds of them) hit the cache
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
