"""Experiment: K clusters per raster grid step (floor amortization).

The roofline ladder shows a ~5.6 ms pipeline+DMA floor for 6144 grid
steps (~0.91 us/step) on the bench primary wave — comparable to the
whole schedule prep.  This measures whether batching 2 clusters into
one grid step (half the steps, double the per-step fetch) moves the
floor and the full kernel.
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
    tmin = jnp.full((o.shape[0],), 1e-3, jnp.float32)
    tmax = jnp.full((o.shape[0],), INF, jnp.float32)

    S = jax.jit(partial(raster_mod._coarse_stage, rset, clusters,
                        mode="origin", point=o[0], W=W, pc_max=PC))(
        o=o, d=d, t_min=tmin, t_max=tmax)
    nb = int(S["nb"])
    validc = np.asarray(S["validc"])
    b_np = np.asarray(S["b_i"])
    c_np = np.asarray(S["c_i"])
    b_np = np.where(validc, b_np, nb)
    c_np = np.where(validc, c_np, 0)

    # host-side regroup into (tile, c1, c2) steps (prototype; the real
    # thing would do this in XLA with a within-tile rank % 2 partition)
    steps = []
    i = 0
    npairs = int(validc.sum())
    while i < npairs:
        t = b_np[i]
        if i + 1 < npairs and b_np[i + 1] == t:
            steps.append((t, c_np[i], c_np[i + 1]))
            i += 2
        else:
            steps.append((t, c_np[i], c_np[i]))   # dup = no-op re-test
            i += 1
    ns_real = len(steps)
    NS = PC // 2 + 64
    while len(steps) < NS:
        steps.append((nb, 0, 0))
    steps = np.asarray(steps[:NS], np.int32)
    print(f"pairs={npairs} -> steps={ns_real} (cap {NS})")
    tiles2 = jnp.asarray(steps[:, 0])
    cls_a = jnp.asarray(steps[:, 1])
    cls_b = jnp.asarray(steps[:, 2])

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

    def make_kernel(noop: bool):
        def kernel(tiles_ref, ca_ref, cb_ref, rays_ref, subsa_ref,
                   subsb_ref, woopa_ref, woopb_ref, out_ref):
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

            if noop:
                return

            @pl.when(tile < nb)
            def _():
                inv_d = jnp.where(jnp.abs(rays[3:6, :]) > 1e-12,
                                  1.0 / rays[3:6, :], 1e12)
                hp = jax.lax.Precision.HIGHEST
                dn_t = (((0,), (0,)), ((), ()))
                o4 = jnp.concatenate(
                    [rays[0:3, 0:128], -jnp.ones((1, 128), jnp.float32)],
                    axis=0)
                d_rows = rays[3:6, :]
                dot = partial(jax.lax.dot_general, dimension_numbers=dn_t,
                              precision=hp,
                              preferred_element_type=jnp.float32)

                def one_cluster(subs_ref, woop_ref, cl, skip_dup):
                    boxes = subs_ref[0]
                    ent = jnp.full((8, W), -INF, jnp.float32)
                    ext = jnp.full((8, W), INF, jnp.float32)
                    for ax in range(3):
                        t0 = ((boxes[:, ax:ax + 1] - rays[ax:ax + 1, :])
                              * inv_d[ax:ax + 1, :])
                        t1 = ((boxes[:, 3 + ax:4 + ax]
                               - rays[ax:ax + 1, :])
                              * inv_d[ax:ax + 1, :])
                        ent = jnp.maximum(ent, jnp.minimum(t0, t1))
                        ext = jnp.minimum(ext, jnp.maximum(t0, t1))
                    ent = jnp.maximum(ent, tmin_r)
                    ent = jnp.where(ent <= ext, ent, INF)

                    def test_part(part):
                        ws = woop_ref[0, :,
                                      part * step_t:(part + 1) * step_t]
                        opx = dot(ws[0:4], o4)[:, 0:1]
                        opy = dot(ws[4:8], o4)[:, 0:1]
                        opz = dot(ws[8:12], o4)[:, 0:1]
                        dpx = dot(ws[0:3], d_rows)
                        dpy = dot(ws[4:7], d_rows)
                        dpz = dot(ws[8:11], d_rows)
                        safe = jnp.where(jnp.abs(dpz) > 1e-12, dpz, 1e-12)
                        t = -opz / safe
                        uu = opx + t * dpx
                        vv = opy + t * dpy
                        bt = out_ref[0, 0:1, :]
                        m = jnp.minimum(jnp.minimum(uu, vv),
                                        1.0 - (uu + vv))
                        ok = ((jnp.abs(dpz) > 1e-12) & (m >= 0.0)
                              & (t > tmin_r))
                        t = jnp.where(ok, t, INF)
                        t_best = jnp.min(t, axis=0, keepdims=True)
                        closer = t_best < bt
                        tri_row = jax.lax.broadcasted_iota(
                            jnp.int32, (step_t, W), 0)
                        li = jnp.min(
                            jnp.where(t <= t_best, tri_row, step_t),
                            axis=0, keepdims=True)
                        win = tri_row == li
                        slotf = (cl * cluster_tris + part * step_t + li
                                 ).astype(jnp.float32)
                        u_new = jnp.sum(jnp.where(win, uu, 0.0), axis=0,
                                        keepdims=True)
                        v_new = jnp.sum(jnp.where(win, vv, 0.0), axis=0,
                                        keepdims=True)
                        slot_new = jnp.where(closer, slotf,
                                             out_ref[0, 1:2, :])
                        out_ref[0, 0:1, :] = jnp.where(closer, t_best, bt)
                        out_ref[0, 1:2, :] = slot_new
                        out_ref[0, 2:3, :] = jnp.where(
                            closer, u_new, out_ref[0, 2:3, :])
                        out_ref[0, 3:4, :] = jnp.where(
                            closer, v_new, out_ref[0, 3:4, :])

                    for part in range(n_subs):
                        @pl.when(jnp.logical_and(
                            jnp.logical_not(skip_dup),
                            jnp.any(ent[part:part + 1, :]
                                    < out_ref[0, 0:1, :])))
                        def _(part=part):
                            test_part(part)

                ca = ca_ref[b]
                cb = cb_ref[b]
                one_cluster(subsa_ref, woopa_ref, ca, jnp.bool_(False))
                one_cluster(subsb_ref, woopb_ref, cb, cb == ca)

        return kernel

    def run(noop):
        ns = tiles2.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ns,),
            in_specs=[
                pl.BlockSpec((8, W), lambda b, t, ca, cb: (0, t[b]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 8), lambda b, t, ca, cb: (ca[b], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 8), lambda b, t, ca, cb: (cb[b], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, cluster_tris),
                             lambda b, t, ca, cb: (ca[b], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, cluster_tris),
                             lambda b, t, ca, cb: (cb[b], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, W),
                                   lambda b, t, ca, cb: (t[b], 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            make_kernel(noop),
            out_shape=jax.ShapeDtypeStruct((nb + 1, 8, W), jnp.float32),
            grid_spec=grid_spec,
            interpret=jax.default_backend() == "cpu",
        )
        fn = jax.jit(lambda: call(tiles2, cls_a, cls_b, rays_t_ext, sub8,
                                  sub8, clusters.woop_t, clusters.woop_t))
        ms = timeit(fn)
        return ms, fn

    ms0, _ = run(True)
    print(f"2-cluster noop floor: {ms0:.2f} ms  (vs 5.60 at 1/step)")
    ms1, fn = run(False)
    print(f"2-cluster full kernel: {ms1:.2f} ms  (vs 17.76 at 1/step)")

    # exactness vs the production kernel
    from optix_ray_tracer_tpu.ops.raster import raster_query
    t_ref, slot_ref, *_ = raster_query(rset, clusters, o, d, tmin, tmax,
                                       mode="origin", point=o[0],
                                       pc_max=PC)
    out = fn()
    res = jnp.swapaxes(out[:nb, 0:4, :], 1, 2).reshape(nb * W, 4)
    cnt_b = np.asarray(S["cnt_b"])
    touched = np.repeat(cnt_b > 0, W)
    slotf = np.asarray(res[:, 1])
    miss = (slotf < 0) | (~touched)
    slot2 = np.where(miss, -1, np.maximum(slotf, 0)).astype(np.int64)
    bad = int((slot2 != np.asarray(slot_ref)).sum())
    print(f"exactness vs production kernel: {1024 * 1024 - bad}"
          f"/{1024 * 1024} slots match ({bad} mismatches)")


if __name__ == "__main__":
    main()
