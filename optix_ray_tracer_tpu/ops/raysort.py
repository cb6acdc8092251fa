"""Wavefront coherence keys + the sphere merge shared by intersectors.

Extracted from the retired packet-traversal module (round-3 pruning,
PARITY.md): these two pieces are load-bearing for the production block
marcher (ops/march.py) and the TLAS path (ops/instanced.py); the packet
traversal itself was an ablation whose measurements live in PERF.md.
"""

from __future__ import annotations

import jax.numpy as jnp

from optix_ray_tracer_tpu.ops.intersect import Hit, PRIM_SPHERE
from optix_ray_tracer_tpu.scene.geometry import Scene


def ray_sort_keys(o, d, scene_lo, scene_hi):
    """Coherence keys: coarse origin Morton (high bits) + direction Morton
    (low bits).

    Ray blocks are only efficient when their rays visit similar clusters;
    this key makes that true for BOTH camera rays (identical origin => key
    is a direction-space tile index) and bounce rays (origin locality
    dominates).  The full-wavefront sort is one 32-bit XLA sort — cheap
    next to traversal (PERF.md cost model).
    """
    from optix_ray_tracer_tpu.ops.bvh import morton_codes
    o_morton = morton_codes(o, scene_lo, scene_hi)       # 30 bits
    d_morton = morton_codes(d, jnp.full(3, -1.0), jnp.full(3, 1.0))
    return ((o_morton >> 18) << 20) | (d_morton >> 10)


def sphere_bruteforce_merge(scene: Scene, o, d, t_min, t_max,
                            hit: Hit) -> Hit:
    """Fold the (few) spheres in via a dense test; scenes are
    triangle-heavy and spheres are config extras (ground plane etc.)."""
    from optix_ray_tracer_tpu.ops.intersect import ray_sphere_block
    ts = ray_sphere_block(o, d, scene.spheres.centers, scene.spheres.radii,
                          t_min, t_max)                     # (R, S)
    si = jnp.argmin(ts, axis=-1)
    st = jnp.take_along_axis(ts, si[:, None], -1)[:, 0]
    closer = st < hit.t
    return Hit(
        t=jnp.where(closer, st, hit.t),
        prim_type=jnp.where(closer, PRIM_SPHERE, hit.prim_type),
        prim_id=jnp.where(closer, si.astype(jnp.int32), hit.prim_id),
        u=jnp.where(closer, 0.0, hit.u),
        v=jnp.where(closer, 0.0, hit.v))
