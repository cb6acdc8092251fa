"""Instanced-TLAS throughput (VERDICT r3 #7): TLAS raster vs TLAS
marcher vs flattening at the 500-instance benchmark scale.

Waves: 1M-ray camera wave in 32x32 screen-tile layout (the raster
engines' contract), plus a point-light occlusion wave.  Honest timing:
host-fetch sync per measured rep, best-of-5.

Usage: python tools/tlas_bench.py [P]   (default 500 instances)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from optix_ray_tracer_tpu.io.meshgen import sphere_with_n_triangles
from optix_ray_tracer_tpu.ops.instanced import (
    build_instanced_library, make_instanced_intersector,
)
from optix_ray_tracer_tpu.ops.march import make_march_intersector
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles
from optix_ray_tracer_tpu.utils.jitcache import enable_compilation_cache

enable_compilation_cache()

WIDTH = HEIGHT = 1024
TH = TW = 32


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def timeit(fn, reps=3, best_of=5):
    out = fn()
    sync(jax.tree.leaves(out)[0])
    best = np.inf
    for _ in range(best_of):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def tile_order(a):
    b = a.reshape(HEIGHT // TH, TH, WIDTH // TW, TW, 3).swapaxes(1, 2)
    return b.reshape(-1, 3)


def main(P=500):
    sizes = (80, 200, 450)
    meshes = [sphere_with_n_triangles(s)[0] for s in sizes]
    counts = np.asarray([m.shape[0] for m in meshes], np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    lib = np.concatenate(meshes, axis=0).astype(np.float32)

    rng = np.random.default_rng(7)
    shape_ids = rng.integers(0, len(sizes), P)
    q = rng.normal(size=(P, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    rot = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=1).reshape(P, 3, 3).astype(np.float32)
    shift = rng.uniform(-12, 12, (P, 3)).astype(np.float32)

    flat_tris = sum(int(counts[s]) for s in shape_ids)
    print(f"{P} instances, {flat_tris} flattened triangles")

    library = build_instanced_library(lib, offsets, counts)
    inter = make_instanced_intersector(library, shape_ids, rot, shift)
    print(f"TLAS pairs: {inter.pair_min.shape[0]}, library clusters: "
          f"{library.woop_t.shape[0]}")

    # flattened oracle scene (the production Time-mode path)
    flat = []
    for p, s in enumerate(shape_ids):
        lo, c = int(offsets[s]), int(counts[s])
        flat.append(np.einsum("ij,tkj->tki", rot[p], lib[lo:lo + c])
                    + shift[p])
    flat = np.concatenate(flat, 0).astype(np.float32)
    fscene = Scene(spheres=Spheres.empty(),
                   triangles=Triangles.from_arrays(flat))
    finter = make_march_intersector(fscene, raster=True)

    cam = Camera.look_at((40.0, 3.0, 5.0), (0.0, 0.0, 0.0),
                         (0.0, 0.0, 1.0))
    o, d = cam.generate_rays(WIDTH, HEIGHT)
    o = tile_order(o.reshape(-1, 3))
    d = tile_order(d.reshape(-1, 3))
    point = jnp.asarray((40.0, 3.0, 5.0), jnp.float32)
    n = o.shape[0]

    @jax.jit
    def tlas_raster(o, d):
        hit, inst = inter.intersect_from(o, d, mode="origin", point=point,
                                         block_rays=TH * TW)
        return hit.t

    @jax.jit
    def tlas_march(o, d):
        hit, inst = inter.intersect(o, d)
        return hit.t

    @jax.jit
    def flat_raster(o, d):
        return finter.intersect_from(fscene, o, d, mode="origin",
                                     point=point, block_rays=TH * TW).t

    t_fr = timeit(lambda: flat_raster(o, d))
    print(f"flatten+raster:  {t_fr * 1e3:8.1f} ms  "
          f"{n / t_fr / 1e6:6.2f} Mrays/s")
    t_tr = timeit(lambda: tlas_raster(o, d))
    print(f"TLAS raster:     {t_tr * 1e3:8.1f} ms  "
          f"{n / t_tr / 1e6:6.2f} Mrays/s  ({t_tr / t_fr:.2f}x flatten)")
    t_tm = timeit(lambda: tlas_march(o, d), reps=1, best_of=2)
    print(f"TLAS marcher:    {t_tm * 1e3:8.1f} ms  "
          f"{n / t_tm / 1e6:6.2f} Mrays/s  ({t_tm / t_fr:.2f}x flatten)")

    # agreement spot-check: TLAS tests object-space verts + transform,
    # flatten tests world-baked verts — same surfaces, different fp
    # paths, so ties at grazing edges may pick different (equally valid)
    # nearest triangles.  Expect ~1e-6 typical rel diff, a handful of
    # tie flips per Mray.
    a = np.asarray(tlas_raster(o, d))
    b = np.asarray(flat_raster(o, d))
    hit_a = a < 1e15
    hit_b = b < 1e15
    m = hit_a & hit_b
    rel = np.abs(a[m] - b[m]) / np.maximum(b[m], 1e-6)
    print(f"hit masks agree: {(hit_a == hit_b).mean():.6f}, t rel diff "
          f"p999 {np.quantile(rel, 0.999):.2e}, ties (> 2e-4): "
          f"{int((rel > 2e-4).sum())}/{int(m.sum())}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
