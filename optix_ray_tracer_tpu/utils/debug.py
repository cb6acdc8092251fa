"""Debug/validation mode — the ``debug-mode`` config flag made real.

The reference maps ``debug-mode`` to GPU validation layers: OptiX
validation mode (``src/Global/RendererImpl.cu:14``), Vulkan validation
layers + debug messenger (``SDL_VKWindow.cu:354-402``), D3D debug devices.
The TPU-native equivalents are:

* ``jax_debug_nans`` — every jitted computation re-runs eagerly on NaN
  production and raises at the producing primitive (the analog of an
  OptiX validation-mode abort on bad values);
* acceleration-structure validation on every build/refit — each
  triangle's AABB must be contained by its cluster's AABB (the analog of
  OptiX validation mode's AS checks).

Enabled once per process from the config flag (``__main__``), checked by
the frontends' intersector builders.
"""

from __future__ import annotations

import numpy as np

from optix_ray_tracer_tpu.utils.logging import LOG, RendererError

#: process-wide flag, set by :func:`enable_debug_mode`
DEBUG_MODE = False


def enable_debug_mode() -> None:
    """Turn on validation (RendererImpl.cu:14 analog).  Idempotent."""
    global DEBUG_MODE
    if DEBUG_MODE:
        return
    import jax

    jax.config.update("jax_debug_nans", True)
    DEBUG_MODE = True
    LOG.info("debug-mode: jax_debug_nans on, accel validation on")


def validate_clusters(clusters, tri_vertices, num_tris: int) -> None:
    """Assert every valid triangle is inside its cluster AABB.

    ``clusters``: ops.sweep.ClusterSet; ``tri_vertices``: (T, 3, 3).
    Raises :class:`RendererError` on a containment violation (the OptiX
    validation-mode AS-check analog).  One device reduction; only runs in
    debug mode, so the cost is opt-in.
    """
    import jax.numpy as jnp

    from optix_ray_tracer_tpu.ops.sweep import CHUNK

    n_pad = clusters.prim_index.shape[0]
    C = n_pad // CHUNK
    sorted_tris = jnp.asarray(tri_vertices, jnp.float32)[clusters.prim_index]
    valid = (jnp.arange(n_pad) < num_tris)[:, None]
    lo = jnp.where(valid, jnp.min(sorted_tris, axis=1), jnp.inf)
    hi = jnp.where(valid, jnp.max(sorted_tris, axis=1), -jnp.inf)
    clo = jnp.min(lo.reshape(C, CHUNK, 3), axis=1)
    chi = jnp.max(hi.reshape(C, CHUNK, 3), axis=1)
    empty = jnp.isnan(clusters.cluster_min[:, 0])
    extent = jnp.nanmax(clusters.cluster_max) - jnp.nanmin(clusters.cluster_min)
    eps = 1e-4 * jnp.maximum(extent, 1.0)
    ok = ((clo >= clusters.cluster_min - eps)
          & (chi <= clusters.cluster_max + eps)) | empty[:, None] \
        | jnp.isinf(clo)   # pure-padding groups inside a non-empty cluster
    bad = int(np.asarray(jnp.sum(~ok)))
    if bad:
        raise RendererError(
            f"accel validation failed: {bad} cluster-containment "
            f"violations (debug-mode)")
    LOG.debug("accel validation ok: %d clusters", C)


def maybe_validate_accel(intersector, scene) -> None:
    """Debug-mode hook called by the frontends on every build/refit."""
    if not DEBUG_MODE or intersector is None:
        return
    from optix_ray_tracer_tpu.ops.march import MarchIntersector

    if isinstance(intersector, MarchIntersector):
        validate_clusters(intersector.clusters, scene.triangles.vertices,
                          intersector.num_tris)
