"""Persistent XLA compilation cache — the PTX/module-cache analog.

The reference caches compiled OptiX modules/pipelines so later runs skip
PTX JIT (reference: OptiX module cache via the driver's disk cache; the
renderer also bakes per-file GAS caches, src/Global/RendererMesh.cu).
The TPU analog is XLA's persistent compilation cache: the fused
animation chunk alone costs minutes of Mosaic/XLA compile per process,
all of it byte-identical across runs of the same configuration.

Enabled by the CLI, bench, and viewer entry points (NOT on package
import — a library must not mutate global jax config for its host
process).  Opt out with OPTIX_TPU_NO_COMPILE_CACHE=1 or a custom
location via OPTIX_TPU_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Returns the cache dir, or None when disabled by env or unavailable.
    Safe to call multiple times and before/after backend init (jax reads
    the config at compile time).
    """
    if os.environ.get("OPTIX_TPU_NO_COMPILE_CACHE"):
        return None
    cache_dir = os.environ.get("OPTIX_TPU_COMPILE_CACHE_DIR") or \
        os.path.join(os.path.expanduser("~"), ".cache",
                     "optix_ray_tracer_tpu", "xla")
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # the animation chunk compiles in minutes; even sub-second entries
        # (per-file rebuilds, quantizers) are worth keeping
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - old jax without the knobs
        return None
    return cache_dir
