"""Benchmark harness — prints ONE JSON line for the driver.

Metric: primary+shadow ray throughput (Mrays/sec/chip) on a 100k-triangle
mesh scene at 1024x1024 (BASELINE.md target: >= 200 Mrays/sec/chip on
TPU v5e; vs_baseline = value / 200).

Method: fused Pallas block-march intersection (ops/pallas/block_march.py)
of 1M coherent primary rays, then 1M shadow (any-hit) rays toward a point
above the scene from the primary hit points — the two wavefront stages a
deferred renderer issues per sample.  Timed over repeated dispatches after
one warmup (compile excluded).
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_MRAYS = 200.0
WIDTH = HEIGHT = 1024
N_TRIS = 100_000
REPS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from optix_ray_tracer_tpu.io.meshgen import sphere_with_n_triangles
    from optix_ray_tracer_tpu.ops.march import make_march_intersector
    from optix_ray_tracer_tpu.scene.camera import Camera
    from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles

    v, n = sphere_with_n_triangles(N_TRIS)
    scene = Scene(spheres=Spheres.empty(),
                  triangles=Triangles.from_arrays(v, n))
    # fused Pallas block-march intersector (see ops/pallas/block_march.py)
    intersector = make_march_intersector(scene)
    cam = Camera.look_at((3.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    o, d = cam.generate_rays(WIDTH, HEIGHT)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    light = jnp.asarray([3.0, 3.0, 3.0], jnp.float32)

    def step(o, d):
        hit = intersector.intersect(scene, o, d)
        point = o + hit.t[..., None] * d
        point = jnp.where(hit.is_hit[..., None], point, o)
        to_light = light - point
        dist = jnp.linalg.norm(to_light, axis=-1, keepdims=True)
        wl = to_light / jnp.maximum(dist, 1e-6)
        shadowed = intersector.any_hit(scene, point + wl * 1e-3, wl,
                                       t_max=dist[..., 0])
        return hit.t, shadowed

    # warmup / compile.  NOTE: sync via a host fetch of a reduction —
    # block_until_ready resolves before remote execution completes on the
    # tunneled TPU runtime, so it cannot be used for timing here.
    t_vals, sh = step(o, d)
    _ = float(jnp.sum(t_vals == 0)) + float(jnp.sum(sh))

    t0 = time.perf_counter()
    for _ in range(REPS):
        t_vals, sh = step(o, d)
    _ = float(jnp.sum(t_vals == 0)) + float(jnp.sum(sh))
    dt = (time.perf_counter() - t0) / REPS

    nrays = 2 * WIDTH * HEIGHT  # primary + shadow
    mrays = nrays / dt / 1e6
    print(json.dumps({
        "metric": "primary+shadow Mrays/sec/chip, 100k-tri mesh, 1024x1024",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
