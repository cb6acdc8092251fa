"""Roofline breakdown of the tile-raster bench step (VERDICT r3 #3).

Splits the headline bench step (primary + point-light shadow wave,
100k-tri mesh, 1024x1024) into its cost components on the real chip:

* end-to-end step, each wave in isolation;
* schedule prep (the XLA coarse stage: projections, pair enumeration,
  depth sort) vs kernel vs epilogue;
* kernel work ladder, via variant kernel bodies over the SAME pair
  schedule: noop (pipeline+DMA floor) -> slab gates -> +Woop dots
  (MXU) -> +test math (VPU) -> full (winner u/v extraction).

Usage: python tools/roofline.py  (runs on the default backend).
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from optix_ray_tracer_tpu.io.meshgen import sphere_with_n_triangles
from optix_ray_tracer_tpu.ops import raster as raster_mod
from optix_ray_tracer_tpu.ops.march import make_march_intersector
from optix_ray_tracer_tpu.ops.sweep import SUBS_PER_CLUSTER
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles
from optix_ray_tracer_tpu.utils.jitcache import enable_compilation_cache
from optix_ray_tracer_tpu.utils.vecmath import INF

enable_compilation_cache()

WIDTH = HEIGHT = 1024
N_TRIS = 100_000
REPS = 5
PC = 6144
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
    return best * 1e3  # ms


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
    light = jnp.asarray([3.0, 3.0, 3.0], jnp.float32)

    # ---- end-to-end step + each wave ----
    @jax.jit
    def step(o, d):
        hit = intersector.intersect_from(scene, o, d, mode="origin",
                                         point=o[0], pc_max=PC)
        point = o + hit.t[..., None] * d
        point = jnp.where(hit.is_hit[..., None], point, o)
        to_light = light - point
        dist = jnp.linalg.norm(to_light, axis=-1, keepdims=True)
        wl = to_light / jnp.maximum(dist, 1e-6)
        shadowed = intersector.any_hit_from(
            scene, point + wl * 1e-3, wl, mode="target", point=light,
            t_max=dist[..., 0], pc_max=PC)
        return hit.t, shadowed

    @jax.jit
    def primary(o, d):
        return intersector.intersect_from(scene, o, d, mode="origin",
                                          point=o[0], pc_max=PC).t

    hit = jax.jit(lambda o, d: intersector.intersect_from(
        scene, o, d, mode="origin", point=o[0], pc_max=PC))(o, d)
    point = o + hit.t[..., None] * d
    point = jnp.where(hit.is_hit[..., None], point, o)
    to_light = light - point
    dist = jnp.linalg.norm(to_light, axis=-1, keepdims=True)
    wl = to_light / jnp.maximum(dist, 1e-6)
    so = point + wl * 1e-3
    st = dist[..., 0]

    @jax.jit
    def shadow(so, wl, st):
        return intersector.any_hit_from(scene, so, wl, mode="target",
                                        point=light, t_max=st, pc_max=PC)

    t_step = timeit(step, o, d)
    t_prim = timeit(primary, o, d)
    t_shad = timeit(shadow, so, wl, st)
    print(f"step: {t_step:.2f} ms  ({2 * 1024**2 / t_step / 1e3:.1f} Mrays/s)")
    print(f"primary wave alone: {t_prim:.2f} ms")
    print(f"shadow  wave alone: {t_shad:.2f} ms")

    # ---- schedule prep alone ----
    clusters = intersector.clusters
    rset = intersector.raster
    tmin = jnp.full((o.shape[0],), 1e-3, jnp.float32)
    tmax = jnp.full((o.shape[0],), INF, jnp.float32)

    @jax.jit
    def prep(o, d):
        S = raster_mod._coarse_stage(rset, clusters, o, d, tmin, tmax,
                                     "origin", o[0], W, PC)
        return S["b_i"], S["c_i"], S["pc_total"]

    t_prep = timeit(prep, o, d)
    b_i, c_i, pc_total = prep(o, d)
    print(f"coarse stage (schedule prep): {t_prep:.2f} ms, "
          f"pairs={int(pc_total)}")

    # ---- kernel ladder over the real primary schedule ----
    S = jax.jit(partial(raster_mod._coarse_stage, rset, clusters,
                        mode="origin", point=o[0], W=W, pc_max=PC))(
        o=o, d=d, t_min=tmin, t_max=tmax)
    nb = int(S["nb"])
    pair_tiles = jnp.where(S["validc"], S["b_i"], nb).astype(jnp.int32)
    pair_clusters = jnp.where(S["validc"], S["c_i"], 0).astype(jnp.int32)
    C = clusters.num_clusters
    sm = clusters.sub_min.reshape(C, SUBS_PER_CLUSTER, 3)
    sx = clusters.sub_max.reshape(C, SUBS_PER_CLUSTER, 3)
    rows = jnp.concatenate(
        [sm, sx, jnp.zeros((C, SUBS_PER_CLUSTER, 2), jnp.float32)], axis=2)
    sub8 = jnp.concatenate(
        [rows, jnp.full((C, 8 - SUBS_PER_CLUSTER, 8), jnp.nan,
                        jnp.float32)], axis=1)
    rays_t_ext = jnp.concatenate(
        [S["o_p"].T, S["d_p"].T, S["tmin_p"][None, :],
         S["tmax_p"][None, :]], axis=0)
    cluster_tris = clusters.woop_t.shape[2]
    n_subs = SUBS_PER_CLUSTER
    step_t = cluster_tris // n_subs

    def variant_kernel(level):
        """level: 0 noop, 1 slabs, 2 +dots, 3 +test math, 4 full."""
        def kernel(tiles_ref, cls_ref, rays_ref, subs_ref, woop_ref,
                   out_ref):
            b = pl.program_id(0)
            tile = tiles_ref[b]
            prev = tiles_ref[jnp.maximum(b - 1, 0)]
            first = jnp.logical_or(b == 0, tile != prev)
            rays = rays_ref[...]
            tmin_r = rays[6:7, :]

            @pl.when(first)
            def _():
                out_ref[0, 0:1, :] = rays[7:8, :]
                out_ref[0, 1:2, :] = jnp.full((1, W), -1.0, jnp.float32)
                out_ref[0, 2:3, :] = jnp.zeros((1, W), jnp.float32)
                out_ref[0, 3:4, :] = jnp.zeros((1, W), jnp.float32)

            if level == 0:
                return

            @pl.when(tile < nb)
            def _():
                inv_d = jnp.where(jnp.abs(rays[3:6, :]) > 1e-12,
                                  1.0 / rays[3:6, :], 1e12)
                boxes = subs_ref[0]
                ent = jnp.full((8, W), -INF, jnp.float32)
                ext = jnp.full((8, W), INF, jnp.float32)
                for ax in range(3):
                    t0 = ((boxes[:, ax:ax + 1] - rays[ax:ax + 1, :])
                          * inv_d[ax:ax + 1, :])
                    t1 = ((boxes[:, 3 + ax:4 + ax] - rays[ax:ax + 1, :])
                          * inv_d[ax:ax + 1, :])
                    ent = jnp.maximum(ent, jnp.minimum(t0, t1))
                    ext = jnp.minimum(ext, jnp.maximum(t0, t1))
                ent = jnp.maximum(ent, tmin_r)
                ent = jnp.where(ent <= ext, ent, INF)
                if level == 1:
                    out_ref[0, 2:3, :] = jnp.min(ent, axis=0, keepdims=True)
                    return

                hp = jax.lax.Precision.HIGHEST
                dn_t = (((0,), (0,)), ((), ()))
                ow = 128          # common == "origin"
                o4 = jnp.concatenate(
                    [rays[0:3, 0:ow], -jnp.ones((1, ow), jnp.float32)],
                    axis=0)
                d_rows = rays[3:6, :]
                dot = partial(jax.lax.dot_general, dimension_numbers=dn_t,
                              precision=hp,
                              preferred_element_type=jnp.float32)
                cl = cls_ref[b]

                def test_part(part):
                    ws = woop_ref[0, :, part * step_t:(part + 1) * step_t]
                    opx = dot(ws[0:4], o4)[:, 0:1]
                    opy = dot(ws[4:8], o4)[:, 0:1]
                    opz = dot(ws[8:12], o4)[:, 0:1]
                    dpx = dot(ws[0:3], d_rows)
                    dpy = dot(ws[4:7], d_rows)
                    dpz = dot(ws[8:11], d_rows)
                    if level == 2:
                        out_ref[0, 2:3, :] = (
                            out_ref[0, 2:3, :]
                            + jnp.sum(dpx + dpy + dpz, axis=0,
                                      keepdims=True)
                            + opx[0:1, 0:1] + opy[0:1, 0:1]
                            + opz[0:1, 0:1])
                        return
                    safe = jnp.where(jnp.abs(dpz) > 1e-12, dpz, 1e-12)
                    t = -opz / safe
                    uu = opx + t * dpx
                    vv = opy + t * dpy
                    bt = out_ref[0, 0:1, :]
                    ok = ((jnp.abs(dpz) > 1e-12) & (uu >= 0.0)
                          & (vv >= 0.0) & (uu + vv <= 1.0)
                          & (t > tmin_r) & (t < bt))
                    t = jnp.where(ok, t, INF)
                    t_best = jnp.min(t, axis=0, keepdims=True)
                    closer = t_best < bt
                    if level == 3:
                        out_ref[0, 0:1, :] = jnp.where(closer, t_best, bt)
                        return
                    tri_row = jax.lax.broadcasted_iota(
                        jnp.int32, (step_t, W), 0)
                    li = jnp.min(jnp.where(t <= t_best, tri_row, step_t),
                                 axis=0, keepdims=True)
                    win = tri_row == li
                    slotf = (cl * cluster_tris + part * step_t + li
                             ).astype(jnp.float32)
                    u_new = jnp.sum(jnp.where(win, uu, 0.0), axis=0,
                                    keepdims=True)
                    v_new = jnp.sum(jnp.where(win, vv, 0.0), axis=0,
                                    keepdims=True)
                    slot_new = jnp.where(closer, slotf, out_ref[0, 1:2, :])
                    out_ref[0, 0:1, :] = jnp.where(closer, t_best, bt)
                    out_ref[0, 1:2, :] = slot_new
                    out_ref[0, 2:3, :] = jnp.where(closer, u_new,
                                                   out_ref[0, 2:3, :])
                    out_ref[0, 3:4, :] = jnp.where(closer, v_new,
                                                   out_ref[0, 3:4, :])

                for part in range(n_subs):
                    @pl.when(jnp.any(ent[part:part + 1, :]
                                     < out_ref[0, 0:1, :]))
                    def _(part=part):
                        test_part(part)

        return kernel

    def run_variant(level):
        np_ = pair_tiles.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(np_,),
            in_specs=[
                pl.BlockSpec((8, W), lambda b, tiles, cls: (0, tiles[b]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 8),
                             lambda b, tiles, cls: (cls[b], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, cluster_tris),
                             lambda b, tiles, cls: (cls[b], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, W),
                                   lambda b, tiles, cls: (tiles[b], 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            variant_kernel(level),
            out_shape=jax.ShapeDtypeStruct((nb + 1, 8, W), jnp.float32),
            grid_spec=grid_spec,
            interpret=jax.default_backend() == "cpu",
        )
        fn = jax.jit(lambda: call(pair_tiles, pair_clusters, rays_t_ext,
                                  sub8, clusters.woop_t))
        return timeit(fn)

    names = ["noop (pipeline+DMA floor)", "slab gates",
             "+Woop dots (MXU)", "+test math (VPU)",
             "full (winner u/v extraction)"]
    for lv, name in enumerate(names):
        print(f"kernel level {lv} [{name}]: {run_variant(lv):.2f} ms")


if __name__ == "__main__":
    main()
