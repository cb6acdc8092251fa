"""Experiment: bf16 candidate tests in the tile-raster kernel
(VERDICT r4 #2).

The round-2 bf16 rejection measured the MARCHER's cull (<15% of block
time); the round-4 roofline shows the RASTER kernel's f32 test math is
the binding term (~11.3 ms of 17.8 on the bench primary wave), so the
old verdict does not transfer.  This measures the kernel with
``bf16_test=True`` (tile_raster._make_cluster_kernel): Woop dots at
DEFAULT precision over bf16 operands (1 MXU pass vs fp32 HIGHEST's ~6)
and bf16 element math — against the production f32 kernel, over the
SAME frozen pair schedule, plus a variant with the woop array itself in
bf16 (halved DMA bytes — pairstep_exp showed the grid floor is
bytes-bound, not step-bound).

Accuracy is reported (slot flips, t error) but NOT required here: this
is the speed ceiling measurement that decides whether an exactness
design (fp32 winner re-test) is worth building.

Usage: python tools/bf16_exp.py [g ...]   (default: 1)
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from optix_ray_tracer_tpu.io.meshgen import sphere_with_n_triangles
from optix_ray_tracer_tpu.ops import raster as raster_mod
from optix_ray_tracer_tpu.ops.march import make_march_intersector
from optix_ray_tracer_tpu.ops.pallas.tile_raster import raster_cluster_call
from optix_ray_tracer_tpu.ops.sweep import SUBS_PER_CLUSTER
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles
from optix_ray_tracer_tpu.utils.jitcache import enable_compilation_cache
from optix_ray_tracer_tpu.utils.vecmath import INF

enable_compilation_cache()

WIDTH = HEIGHT = 1024
N_TRIS = 100_000
REPS = 5
W = 1024


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(fn, *args):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        sync(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best * 1e3


def main():
    gs = [int(a) for a in sys.argv[1:]] or [1]
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
    clusters = intersector.clusters
    rset = intersector.raster
    C = clusters.num_clusters
    tmin = jnp.full((o.shape[0],), 1e-3, jnp.float32)
    tmax = jnp.full((o.shape[0],), 1e16, jnp.float32)

    for g in gs:
        pc = raster_mod.measure_pair_count(
            rset, clusters, o, d, tmin, tmax, "origin", o[0],
            granularity=g)
        PC = raster_mod.round_pc_max(pc)
        S = jax.jit(partial(raster_mod._coarse_stage, rset, clusters,
                            mode="origin", point=o[0], W=W, pc_max=PC,
                            granularity=g))(
            o=o, d=d, t_min=tmin, t_max=tmax)
        nb = int(S["nb"])
        # freeze the schedule on host so only the kernel is timed
        validc = np.asarray(S["validc"])
        pair_tiles = jnp.asarray(
            np.where(validc, np.asarray(S["b_i"]), nb), jnp.int32)
        pair_ids = jnp.asarray(
            np.where(validc, np.asarray(S["c_i"]), 0), jnp.int32)

        n_subs = SUBS_PER_CLUSTER // g
        sm = clusters.sub_min.reshape(C * g, n_subs, 3)
        sx = clusters.sub_max.reshape(C * g, n_subs, 3)
        rows = jnp.concatenate(
            [sm, sx, jnp.zeros((C * g, n_subs, 2), jnp.float32)], axis=2)
        sub8 = jnp.concatenate(
            [rows, jnp.full((C * g, 8 - n_subs, 8), jnp.nan,
                            jnp.float32)], axis=1)
        rays_t_ext = jnp.concatenate(
            [S["o_p"].T, S["d_p"].T, S["tmin_p"][None, :],
             S["tmax_p"][None, :]], axis=0)
        ct = clusters.woop_t.shape[2] // g
        if g == 1:
            woop_g = clusters.woop_t
        else:
            woop_g = (clusters.woop_t.reshape(C, 16, g, ct)
                      .transpose(0, 2, 1, 3).reshape(C * g, 16, ct))
        woop_b = woop_g.astype(jnp.bfloat16)

        def run(woop, bf16):
            return jax.jit(lambda: raster_cluster_call(
                pair_tiles, pair_ids, rays_t_ext, sub8, woop,
                n_blocks=nb, w=W, any_hit=False, cluster_tris=ct,
                n_subs=n_subs, common="origin", granularity=g,
                bf16_test=bf16))

        f32 = run(woop_g, False)
        b16 = run(woop_g, True)
        b16e = run(woop_g, "elem")
        b16d = run(woop_b, "elem")
        ms_f32 = timeit(f32)
        ms_b16 = timeit(b16)
        ms_b16e = timeit(b16e)
        ms_b16d = timeit(b16d)
        print(f"g={g} pairs={pc}: kernel f32 {ms_f32:.2f} ms | "
              f"1-pass dots {ms_b16:.2f} ms | + bf16 elem {ms_b16e:.2f}"
              f" ms | + bf16 DMA {ms_b16d:.2f} ms", flush=True)

        o_f = np.asarray(f32()[:nb, 0:2, :])
        o_b = np.asarray(b16d()[:nb, 0:2, :])
        t_f, s_f = o_f[:, 0, :].ravel(), o_f[:, 1, :].ravel()
        t_b, s_b = o_b[:, 0, :].ravel(), o_b[:, 1, :].ravel()
        flips = int((s_f != s_b).sum())
        both = (s_f >= 0) & (s_b >= 0)
        terr = np.abs(t_b[both] - t_f[both]) / np.maximum(
            np.abs(t_f[both]), 1e-6)
        print(f"g={g}: bf16 slot flips {flips}/{s_f.size} "
              f"({(s_f >= 0).sum()} f32 hits, {(s_b >= 0).sum()} bf16); "
              f"t rel err p50 {np.percentile(terr, 50):.2e} "
              f"p999 {np.percentile(terr, 99.9):.2e}", flush=True)


if __name__ == "__main__":
    main()
