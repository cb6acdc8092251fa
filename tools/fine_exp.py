"""Experiment: sub-cluster schedule granularity for the raster engine.

VERDICT r4 #1: the roofline proves the tile-raster kernel is VPU-bound
on Woop test math (~1,300 test slots/ray at cluster granularity).
Binning pairs at CHUNK/g-triangle granularity shrinks the projected
rects and refines the depth sort — fewer live test slots — at the cost
of more grid steps (each ~0.91 us of pipeline floor).  The fetch stays
a BlockSpec column window of the STATIC woop_t (no gather — the
rejected 8-tri variant died on its gather, not on fineness).

Measures, on the bench scene (100k tris, 1M-ray camera wave + flipped
point-light shadow wave): pair counts, full-query times per wave, the
combined bench-style step, and exactness vs granularity 1.

Usage: python tools/fine_exp.py [g ...]   (default: 1 2 4)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from optix_ray_tracer_tpu.io.meshgen import sphere_with_n_triangles
from optix_ray_tracer_tpu.ops.march import make_march_intersector
from optix_ray_tracer_tpu.ops.raster import (
    measure_pair_count, raster_query, round_pc_max,
)
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles
from optix_ray_tracer_tpu.utils.jitcache import enable_compilation_cache
from optix_ray_tracer_tpu.utils.vecmath import INF

enable_compilation_cache()

WIDTH = HEIGHT = 1024
N_TRIS = 100_000
REPS = 5


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(fn, *args, best_of: int = 5):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    best = np.inf
    for _ in range(best_of):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        sync(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best * 1e3


def main():
    gs = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    v, n = sphere_with_n_triangles(N_TRIS)
    scene = Scene(spheres=Spheres.empty(),
                  triangles=Triangles.from_arrays(v, n))
    intersector = make_march_intersector(scene, raster=True)
    cam = Camera.look_at((3.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    o, d = cam.generate_rays(WIDTH, HEIGHT)
    TH = TW = 32
    o = o.reshape(HEIGHT // TH, TH, WIDTH // TW, TW, 3).swapaxes(1, 2)
    d = d.reshape(HEIGHT // TH, TH, WIDTH // TW, TW, 3).swapaxes(1, 2)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    light = jnp.asarray([3.0, 3.0, 3.0], jnp.float32)
    clusters = intersector.clusters
    rset = intersector.raster
    R = o.shape[0]
    tmin = jnp.full((R,), 1e-3, jnp.float32)
    tmaxI = jnp.full((R,), 1e16, jnp.float32)

    # the shadow wave's flipped form (bench.py / intersect_from)
    hit0 = intersector.intersect_from(scene, o, d, mode="origin",
                                      point=o[0])
    p0 = o + hit0.t[..., None] * d
    p0 = jnp.where(hit0.is_hit[..., None], p0, o)
    tl0 = light - p0
    dist0 = jnp.linalg.norm(tl0, axis=-1)
    wl0 = tl0 / jnp.maximum(dist0[..., None], 1e-6)
    so0 = jnp.broadcast_to(light, p0.shape)
    sd0 = -wl0
    d0 = jnp.einsum("rk,rk->r", light[None, :] - (p0 + wl0 * 1e-3), wl0)
    sh_tmin = d0 - dist0
    sh_tmax = d0 - 1e-3

    ref = {}
    for g in gs:
        pc1 = measure_pair_count(rset, clusters, o, d, tmin, tmaxI,
                                 "origin", o[0], granularity=g)
        pc2 = measure_pair_count(rset, clusters, so0, sd0, sh_tmin,
                                 sh_tmax, "origin", light, granularity=g)
        PC = round_pc_max(max(pc1, pc2))
        print(f"g={g}: primary pairs {pc1}, shadow pairs {pc2} "
              f"-> pc_max {PC}", flush=True)

        from optix_ray_tracer_tpu.ops.raster import _coarse_stage
        prep = jax.jit(lambda o_, d_, g=g, PC=PC: _coarse_stage(
            rset, clusters, o_, d_, tmin, tmaxI, "origin", o_[0],
            1024, PC, g)["b_i"])
        ms_prep = timeit(prep, o, d)
        print(f"g={g}: schedule prep {ms_prep:.2f} ms", flush=True)
        prim = jax.jit(lambda o_, d_, g=g, PC=PC: raster_query(
            rset, clusters, o_, d_, tmin, tmaxI, mode="origin",
            point=o_[0], pc_max=PC, granularity=g))
        shad = jax.jit(lambda so, sd, g=g, PC=PC: raster_query(
            rset, clusters, so, sd, sh_tmin, sh_tmax, mode="origin",
            point=light, any_hit=True, pc_max=PC, granularity=g))
        ms_p = timeit(prim, o, d)
        ms_s = timeit(shad, so0, sd0)

        def step(o_, d_, g=g, PC=PC):
            hit = intersector.intersect_from(
                scene, o_, d_, mode="origin", point=o_[0], pc_max=PC,
                granularity=g)
            point = o_ + hit.t[..., None] * d_
            point = jnp.where(hit.is_hit[..., None], point, o_)
            to_light = light - point
            dist = jnp.linalg.norm(to_light, axis=-1, keepdims=True)
            wl = to_light / jnp.maximum(dist, 1e-6)
            shadowed = intersector.any_hit_from(
                scene, point + wl * 1e-3, wl, mode="target", point=light,
                t_max=dist[..., 0], pc_max=PC, granularity=g)
            return hit.t, shadowed

        step_j = jax.jit(step)
        ms_step = timeit(step_j, o, d)
        mrays = 2 * R / (ms_step * 1e-3) / 1e6
        print(f"g={g}: primary {ms_p:.2f} ms, shadow {ms_s:.2f} ms, "
              f"bench step {ms_step:.2f} ms = {mrays:.2f} Mrays/s",
              flush=True)

        t_p, slot_p, *_ = prim(o, d)
        _, hs, *_ = shad(so0, sd0)
        ref[g] = (np.asarray(t_p), np.asarray(slot_p),
                  np.asarray(hs >= 0))
        if 1 in ref and g != 1:
            t0_, s0_, h0_ = ref[1]
            tg, sg, hg = ref[g]
            slot_flip = int((s0_ != sg).sum())
            tie_ok = np.abs(tg - t0_) <= 1e-5 * np.abs(t0_) + 1e-6
            bad = int((~((s0_ == sg) | tie_ok)).sum())
            sh_flip = int((h0_ != hg).sum())
            print(f"g={g} vs g=1: {slot_flip} slot flips "
                  f"({bad} beyond fp-tie), shadow {sh_flip} flips",
                  flush=True)


if __name__ == "__main__":
    main()
