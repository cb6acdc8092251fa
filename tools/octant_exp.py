"""Experiment: per-octant direction intervals in bundle binning
(VERDICT r4 #5 — bounce-wave schedules).

Round 4 rejected the bundle engine for bounce waves because a block's
single direction interval spans a hemisphere — it straddles zero on
every axis, so interval arithmetic admits nearly every cluster (349k
pairs at W=1024).  The octant refinement replaces the one interval test
with 8 cone-bounded tests (lanes masked by direction sign octant) whose
UNION is the pair set — pure masked reductions, no gather, no duplicate
kernel work (ops/raster.bundle_stage ``dir_octants``).

Measures, on the bench scene's REAL bounce wave (cosine-hemisphere
directions from the primary hits) and NEE shadow wave:
  * pair counts: whole-block vs octant binning, several W;
  * throughput: probe-sorted marcher vs bundle engine both ways;
  * exactness of the octant schedule vs the marcher.

Usage: python tools/octant_exp.py
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
from optix_ray_tracer_tpu.ops.raster import bundle_query
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles
from optix_ray_tracer_tpu.utils.jitcache import enable_compilation_cache

enable_compilation_cache()

WIDTH = HEIGHT = 1024
N_TRIS = 100_000
REPS = 5


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


def bounce_waves():
    """(scene, intersector, bounce (o,d,tmax), shadow (o,d,tmax))."""
    v, n = sphere_with_n_triangles(N_TRIS)
    scene = Scene(spheres=Spheres.empty(),
                  triangles=Triangles.from_arrays(v, n))
    inter = make_march_intersector(scene, raster=True)
    cam = Camera.look_at((3.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    o, d = cam.generate_rays(WIDTH, HEIGHT)
    TH = TW = 32
    o = o.reshape(HEIGHT // TH, TH, WIDTH // TW, TW, 3).swapaxes(1, 2)
    d = d.reshape(HEIGHT // TH, TH, WIDTH // TW, TW, 3).swapaxes(1, 2)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    R = o.shape[0]
    hit = jax.jit(lambda o, d: inter.intersect_from(
        scene, o, d, mode="origin", point=o[0]))(o, d)
    t = np.asarray(hit.t)
    live = t < 1e15
    p = np.asarray(o) + t[:, None] * np.asarray(d)
    tri = np.asarray(scene.triangles.vertices).reshape(-1, 3, 3)
    pid = np.asarray(hit.prim_id)
    e1 = tri[pid, 1] - tri[pid, 0]
    e2 = tri[pid, 2] - tri[pid, 0]
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    nrm = np.where((np.sum(nrm * np.asarray(d), -1) < 0)[:, None],
                   nrm, -nrm)
    rng = np.random.default_rng(3)
    u1 = rng.random(R).astype(np.float32)
    u2 = rng.random(R).astype(np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    a = np.where(np.abs(nrm[:, 0:1]) < 0.9, [1.0, 0, 0], [0, 1.0, 0])
    tx = np.cross(nrm, a)
    tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
    ty = np.cross(nrm, tx)
    bd = (r * np.cos(phi))[:, None] * tx + (r * np.sin(phi))[:, None] * ty \
        + np.sqrt(np.maximum(1 - u1, 0))[:, None] * nrm
    bd = (bd / np.maximum(np.linalg.norm(bd, axis=-1, keepdims=True),
                          1e-12)).astype(np.float32)
    ob = jnp.asarray(np.where(live[:, None], p + 1e-3 * nrm, 0.0),
                     jnp.float32)
    db = jnp.asarray(np.where(live[:, None], bd, [0, 0, 1.0]), jnp.float32)
    tmx = jnp.asarray(np.where(live, 1e16, 0.0), jnp.float32)
    lp = np.array([2.0, 2.0, 2.5], np.float32) \
        + 0.2 * rng.standard_normal((R, 3)).astype(np.float32)
    wl = lp - p
    dist = np.linalg.norm(wl, axis=-1, keepdims=True)
    wl = (wl / np.maximum(dist, 1e-6)).astype(np.float32)
    so = jnp.asarray(np.where(live[:, None], p + 1e-3 * nrm, 0.0),
                     jnp.float32)
    sd = jnp.asarray(np.where(live[:, None], wl, [0, 0, 1.0]), jnp.float32)
    st = jnp.asarray(np.where(live, dist[:, 0] - 2e-3, 0.0), jnp.float32)
    return scene, inter, (ob, db, tmx), (so, sd, st), R


def main():
    scene, inter, (ob, db, tmx), (so, sd, st), R = bounce_waves()
    incoh = inter.for_incoherent()
    tmn = jnp.full(R, 1e-3)

    t_m = timeit(jax.jit(lambda a, b, c: incoh.intersect(
        scene, a, b, t_max=c).t), ob, db, tmx)
    print(f"bounce marcher: {t_m:.1f} ms = {R / t_m / 1e3:.2f} Mrays/s",
          flush=True)

    for W in (1024,):
        for oct_, g in ((False, 1), (True, 1), (True, 4)):
            stats = jax.jit(
                lambda a, b, c, W=W, o8=oct_, g=g: bundle_query(
                    inter.clusters, a, b, tmn, c, block_rays=W,
                    pc_max=8, return_stats=True, dir_octants=o8,
                    granularity=g)[5])(ob, db, tmx)
            print(f"  W={W} octants={oct_} g={g}: bounce pairs="
                  f"{int(stats['pc'])}", flush=True)
        for g in (1, 4):
            # time the octant engine at a capacity fitting its pairs
            pc = jax.jit(lambda a, b, c, W=W, g=g: bundle_query(
                inter.clusters, a, b, tmn, c, block_rays=W, pc_max=8,
                return_stats=True, dir_octants=True,
                granularity=g)[5]["pc"])(ob, db, tmx)
            pc_cap = min(int((int(pc) * 1.15 + 1024) // 1024 + 1) * 1024,
                         131072)
            tb = timeit(jax.jit(
                lambda a, b, c, W=W, P=pc_cap, g=g: bundle_query(
                    inter.clusters, a, b, tmn, c, block_rays=W,
                    pc_max=P, dir_octants=True, granularity=g)[0]),
                ob, db, tmx)
            print(f"  W={W} g={g}: octant-bundle bounce {tb:.1f} ms = "
                  f"{R / tb / 1e3:.2f} Mrays/s (cap {pc_cap})",
                  flush=True)

    # NEE shadow wave: octants should also trim the finite-segment pairs
    for W in (1024,):
        for oct_ in (False, True):
            stats = jax.jit(lambda a, b, c, W=W, o8=oct_: bundle_query(
                inter.clusters, a, b, jnp.full(R, 1e-4), c, any_hit=True,
                block_rays=W, pc_max=8, return_stats=True,
                dir_octants=o8)[5])(so, sd, st)
            print(f"  W={W} octants={oct_}: NEE pairs="
                  f"{int(stats['pc'])}", flush=True)
        tb = timeit(jax.jit(lambda a, b, c, W=W: bundle_query(
            inter.clusters, a, b, jnp.full(R, 1e-4), c, any_hit=True,
            block_rays=W, pc_max=12288, dir_octants=True)[0]),
            so, sd, st)
        print(f"  W={W}: octant-bundle NEE {tb:.1f} ms = "
              f"{R / tb / 1e3:.2f} Mrays/s", flush=True)

    # exactness: octant schedule vs marcher on the bounce wave
    t_o, slot_o, _, _, ok = jax.jit(lambda a, b, c: bundle_query(
        inter.clusters, a, b, tmn, c, block_rays=1024, pc_max=131072,
        dir_octants=True))(ob, db, tmx)
    hm = incoh.intersect(scene, ob, db, t_max=tmx)
    live = np.asarray(tmx) > 0
    sm = np.asarray(inter.clusters.prim_index)[
        np.maximum(np.asarray(hm.prim_id), 0)]
    del sm  # marcher returns scene prim ids; compare via slot->prim map
    po = np.asarray(inter.clusters.prim_index)[
        np.maximum(np.asarray(slot_o), 0)]
    po = np.where(np.asarray(slot_o) < 0, -1, po)
    pm = np.where(np.asarray(hm.is_hit), np.asarray(hm.prim_id), -1)
    bad = int((po[live] != pm[live]).sum())
    print(f"octant exactness vs marcher (ok={bool(ok)}): "
          f"{live.sum() - bad}/{live.sum()} live prim ids match",
          flush=True)


if __name__ == "__main__":
    main()
