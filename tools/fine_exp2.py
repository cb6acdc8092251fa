"""Experiment: 16-triangle gate/test parts at granularity 4.

fine_exp showed sub-box (g=4) binning is bit-exact but only saves fetch
bytes — the in-kernel 64-tri slab gates already prune what the finer
rects prune, so the live VPU test term (~11.3 ms) barely moved.  The
gates are TILE-wide (jnp.any over 1024 lanes): the next lever is finer
PARTS — at g=4 each pair is 64 tris; splitting its test into four
16-tri parts gated by 16-tri boxes lets depth retirement skip 3/4 of a
pair when only one quarter matters.  Costs: 4x the gate evals (cheap —
roofline: 20k gates = +0.6 ms) and 16-row MXU dots (less efficient).

Measures kernel-only times over the SAME frozen g=4 schedule:
n_subs=1 (64-tri gate+test, the fine_exp configuration) vs n_subs=4
with 16-tri boxes computed from the raster verts; exactness vs n_subs=1.

Usage: python tools/fine_exp2.py
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

enable_compilation_cache()

WIDTH = HEIGHT = 1024
N_TRIS = 100_000
REPS = 5
W = 1024
G = 4


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

    pc = raster_mod.measure_pair_count(
        rset, clusters, o, d, tmin, tmax, "origin", o[0], granularity=G)
    PC = raster_mod.round_pc_max(pc)
    S = jax.jit(partial(raster_mod._coarse_stage, rset, clusters,
                        mode="origin", point=o[0], W=W, pc_max=PC,
                        granularity=G))(
        o=o, d=d, t_min=tmin, t_max=tmax)
    nb = int(S["nb"])
    validc = np.asarray(S["validc"])
    pair_tiles = jnp.asarray(
        np.where(validc, np.asarray(S["b_i"]), nb), jnp.int32)
    pair_ids = jnp.asarray(
        np.where(validc, np.asarray(S["c_i"]), 0), jnp.int32)
    rays_t_ext = jnp.concatenate(
        [S["o_p"].T, S["d_p"].T, S["tmin_p"][None, :],
         S["tmax_p"][None, :]], axis=0)
    ct = clusters.woop_t.shape[2] // G
    woop_g = (clusters.woop_t.reshape(C, 16, G, ct)
              .transpose(0, 2, 1, 3).reshape(C * G, 16, ct))

    # n_subs=1: the fine_exp configuration (64-tri gate + test)
    n1 = SUBS_PER_CLUSTER // G
    sm = clusters.sub_min.reshape(C * G, n1, 3)
    sx = clusters.sub_max.reshape(C * G, n1, 3)
    rows = jnp.concatenate(
        [sm, sx, jnp.zeros((C * G, n1, 2), jnp.float32)], axis=2)
    sub8_64 = jnp.concatenate(
        [rows, jnp.full((C * G, 8 - n1, 8), jnp.nan, jnp.float32)],
        axis=1)

    # n_subs=4: 16-tri boxes from the raster verts (NaN-safe min/max)
    verts = np.asarray(rset.verts)                    # (n_pad, 3, 3)
    fine = verts.reshape(C * G * 4, 16, 3, 3).reshape(C * G * 4, 48, 3)
    fmin = np.nanmin(fine, axis=1)
    fmax = np.nanmax(fine, axis=1)
    # NaN rows (padding) must stay NaN so their gates never fire
    rows16 = np.concatenate(
        [fmin, fmax, np.zeros((C * G * 4, 2), np.float32)],
        axis=1).reshape(C * G, 4, 8)
    sub8_16 = jnp.asarray(np.concatenate(
        [rows16, np.full((C * G, 4, 8), np.nan, np.float32)],
        axis=1), jnp.float32)

    def run(sub8, n_subs):
        return jax.jit(lambda: raster_cluster_call(
            pair_tiles, pair_ids, rays_t_ext, sub8, woop_g,
            n_blocks=nb, w=W, any_hit=False, cluster_tris=ct,
            n_subs=n_subs, common="origin", granularity=G))

    k64 = run(sub8_64, 1)
    k16 = run(sub8_16, 4)
    ms64 = timeit(k64)
    ms16 = timeit(k16)
    print(f"g=4 pairs={pc}: kernel 64-tri parts {ms64:.2f} ms | "
          f"16-tri parts {ms16:.2f} ms", flush=True)

    a = np.asarray(k64()[:nb, 0:2, :])
    b = np.asarray(k16()[:nb, 0:2, :])
    flips = int((a[:, 1, :] != b[:, 1, :]).sum())
    t_ok = np.abs(b[:, 0, :] - a[:, 0, :]) <= (
        1e-5 * np.abs(a[:, 0, :]) + 1e-6)
    bad = int((~((a[:, 1, :] == b[:, 1, :]) | t_ok)).sum())
    print(f"exactness 16 vs 64: {flips} slot flips "
          f"({bad} beyond fp-tie)", flush=True)


if __name__ == "__main__":
    main()
