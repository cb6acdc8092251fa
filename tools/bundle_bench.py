"""On-chip A/B: bounce-wave throughput, marcher vs bundle engine.

The VERDICT r3 #2 workload: diffuse bounce rays from the bench scene's
primary hits (tile-coherent origins, hemispherical directions, dead
lanes where the primary missed), plus an NEE-style any-hit wave toward
a sampled area-light point.  Measures the probe-sorted block marcher
against intersect_bundled at several block widths, with pair counts.
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
from optix_ray_tracer_tpu.ops.raster import bundle_query, default_bundle_pc_max
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


def main():
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

    # primary hits (tile order)
    hit = jax.jit(lambda o, d: inter.intersect_from(
        scene, o, d, mode="origin", point=o[0]))(o, d)
    t = np.asarray(hit.t)
    live = t < 1e15
    print(f"primary hits: {live.sum()}/{R}")
    p = np.asarray(o) + t[:, None] * np.asarray(d)

    # cosine-hemisphere bounce dirs about the geometric normal
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

    # NEE-style shadow wave: toward jittered points near a small light
    lp = np.array([2.0, 2.0, 2.5], np.float32) \
        + 0.2 * rng.standard_normal((R, 3)).astype(np.float32)
    wl = lp - p
    dist = np.linalg.norm(wl, axis=-1, keepdims=True)
    wl = (wl / np.maximum(dist, 1e-6)).astype(np.float32)
    so = jnp.asarray(np.where(live[:, None], p + 1e-3 * nrm, 0.0),
                     jnp.float32)
    sd = jnp.asarray(np.where(live[:, None], wl, [0, 0, 1.0]), jnp.float32)
    st = jnp.asarray(np.where(live, dist[:, 0] - 2e-3, 0.0), jnp.float32)

    incoh = inter.for_incoherent()
    t_m = timeit(jax.jit(lambda a, b, c: incoh.intersect(
        scene, a, b, t_max=c).t), ob, db, tmx)
    print(f"bounce marcher: {t_m:.1f} ms = {R / t_m / 1e3:.2f} Mrays/s")
    t_s = timeit(jax.jit(lambda a, b, c: incoh.intersect(
        scene, a, b, t_max=c, _any_hit=True).t), so, sd, st)
    print(f"NEE-shadow marcher: {t_s:.1f} ms = {R / t_s / 1e3:.2f} Mrays/s")

    C = inter.clusters.num_clusters
    for W in (1024, 512, 256, 128):
        nb = R // W
        pc = default_bundle_pc_max(nb, C)
        st5 = bundle_query(inter.clusters, ob, db,
                           jnp.full(R, 1e-3), tmx, block_rays=W,
                           pc_max=pc, return_stats=True)[5]
        print(f"  W={W}: bounce pairs={int(st5['pc'])} (cap {pc})")
        tb = timeit(jax.jit(lambda a, b, c: inter.intersect_bundled(
            scene, a, b, t_max=c, block_rays=W, pc_max=pc).t),
            ob, db, tmx)
        print(f"  W={W}: bundle bounce {tb:.1f} ms = "
              f"{R / tb / 1e3:.2f} Mrays/s")
        st6 = bundle_query(inter.clusters, so, sd,
                           jnp.full(R, 1e-3), st, any_hit=True,
                           block_rays=W, pc_max=pc,
                           return_stats=True)[5]
        ts2 = timeit(jax.jit(lambda a, b, c: inter.intersect_bundled(
            scene, a, b, t_max=c, any_hit=True, block_rays=W,
            pc_max=pc).t), so, sd, st)
        print(f"  W={W}: bundle NEE pairs={int(st6['pc'])}, "
              f"{ts2:.1f} ms = {R / ts2 / 1e3:.2f} Mrays/s")

    # exactness spot check at the best width
    hb = inter.intersect_bundled(scene, ob, db, t_max=tmx, block_rays=512)
    hm = incoh.intersect(scene, ob, db, t_max=tmx)
    bad = int((np.asarray(hb.prim_id) != np.asarray(hm.prim_id)).sum())
    print(f"exactness vs marcher: {R - bad}/{R} prim ids match")


def short_first_ab():
    """A/B: marcher vs intersect_short_first on the bench bounce wave."""
    import jax
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
    r_ = np.sqrt(u1)
    phi = 2 * np.pi * u2
    a = np.where(np.abs(nrm[:, 0:1]) < 0.9, [1.0, 0, 0], [0, 1.0, 0])
    tx = np.cross(nrm, a)
    tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
    ty = np.cross(nrm, tx)
    bd = ((r_ * np.cos(phi))[:, None] * tx
          + (r_ * np.sin(phi))[:, None] * ty
          + np.sqrt(np.maximum(1 - u1, 0))[:, None] * nrm)
    bd = (bd / np.maximum(np.linalg.norm(bd, axis=-1, keepdims=True),
                          1e-12)).astype(np.float32)
    ob = jnp.asarray(np.where(live[:, None], p + 1e-3 * nrm, 0.0),
                     jnp.float32)
    db = jnp.asarray(np.where(live[:, None], bd, [0, 0, 1.0]), jnp.float32)
    tmx = jnp.asarray(np.where(live, 1e16, 0.0), jnp.float32)

    incoh = inter.for_incoherent()
    t_m = timeit(jax.jit(lambda a_, b_, c_: incoh.intersect(
        scene, a_, b_, t_max=c_).t), ob, db, tmx)
    print(f"bounce marcher: {t_m:.1f} ms = {R / t_m / 1e3:.2f} Mrays/s")
    hm = incoh.intersect(scene, ob, db, t_max=tmx)
    diag = float(np.linalg.norm(
        np.asarray(inter.scene_hi) - np.asarray(inter.scene_lo)))
    for frac in (0.05, 0.125, 0.25):
        rad = frac * diag
        pc = bundle_query(inter.clusters, ob, db, jnp.full(R, 1e-3),
                          jnp.minimum(tmx, rad), block_rays=1024,
                          pc_max=8, return_stats=True)[5]
        print(f"  r={frac:.3f}*diag: capped pairs={int(pc['pc'])}")
        for W in (1024, 256):
            ts = timeit(jax.jit(
                lambda a_, b_, c_, rad=rad, W=W: inter.intersect_short_first(
                    scene, a_, b_, t_max=c_, radius=rad,
                    block_rays=W).t), ob, db, tmx)
            hs = inter.intersect_short_first(scene, ob, db, t_max=tmx,
                                             radius=rad, block_rays=W)
            bad = int((np.asarray(hs.prim_id)
                       != np.asarray(hm.prim_id)).sum())
            print(f"    W={W}: short-first {ts:.1f} ms = "
                  f"{R / ts / 1e3:.2f} Mrays/s  (prim mismatches {bad})")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sf":
        short_first_ab()
    else:
        main()
