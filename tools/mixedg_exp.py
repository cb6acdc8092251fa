"""Experiment: PER-WAVE schedule granularity + capacity.

bench.py at g=4 for BOTH waves regressed the headline (37.55 -> 37.12)
despite the primary kernel winning (18.7 -> 16.5 ms frozen-schedule):
the any-hit shadow wave's pair count inflates 2.1x at g=4 (5333 ->
11301) and the shared pc_max doubles (6144 -> 13312), growing every
prep array for both waves.  Hypothesis: granularity is a PER-WAVE
knob — nearest-hit waves profit from finer windows (byte floor +
depth retirement), first-hit (any_hit) waves retire so fast that
extra pairs are pure schedule cost — and pc_max should be calibrated
per wave, not shared.

Measures the full bench-style step (primary nearest + flipped shadow
any-hit, 2M rays) for (g_primary, g_shadow) in {1,4}^2 with per-wave
calibrated capacities, plus the shared-capacity arms bench.py r4/r5
actually ran.

Usage: python tools/mixedg_exp.py [g_p g_s ...]
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
    measure_pair_count, round_pc_max,
)
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles
from optix_ray_tracer_tpu.utils.jitcache import enable_compilation_cache

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

    # measured pair counts per wave per granularity
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

    pc = {}
    for g in (1, 2, 4):
        pc[("p", g)] = round_pc_max(measure_pair_count(
            rset, clusters, o, d, tmin, tmaxI, "origin", o[0],
            granularity=g))
        pc[("s", g)] = round_pc_max(measure_pair_count(
            rset, clusters, so0, sd0, d0 - dist0, d0 - 1e-3, "origin",
            light, granularity=g))
        print(f"g={g}: primary cap {pc[('p', g)]}, shadow cap "
              f"{pc[('s', g)]}", flush=True)

    def make_step(gp, gs, pcp, pcs):
        def step(o_, d_):
            hit = intersector.intersect_from(
                scene, o_, d_, mode="origin", point=o_[0], pc_max=pcp,
                granularity=gp)
            point = o_ + hit.t[..., None] * d_
            point = jnp.where(hit.is_hit[..., None], point, o_)
            to_light = light - point
            dist = jnp.linalg.norm(to_light, axis=-1, keepdims=True)
            wl = to_light / jnp.maximum(dist, 1e-6)
            shadowed = intersector.any_hit_from(
                scene, point + wl * 1e-3, wl, mode="target", point=light,
                t_max=dist[..., 0], pc_max=pcs, granularity=gs)
            return hit.t, shadowed
        return jax.jit(step)

    arms = []
    argv = [int(a) for a in sys.argv[1:]]
    if argv:
        pairs = list(zip(argv[::2], argv[1::2]))
    else:
        pairs = [(1, 1), (4, 4), (4, 1), (2, 1), (4, 2), (2, 2)]
    for gp, gs in pairs:
        arms.append((f"g_p={gp} g_s={gs} (per-wave caps)", gp, gs,
                     pc[("p", gp)], pc[("s", gs)]))
    # the shared-cap arms bench.py actually ran
    arms.append(("g=1 shared cap (bench r4)", 1, 1,
                 max(pc[("p", 1)], pc[("s", 1)]),
                 max(pc[("p", 1)], pc[("s", 1)])))
    arms.append(("g=4 shared cap (bench r5 regression)", 4, 4,
                 max(pc[("p", 4)], pc[("s", 4)]),
                 max(pc[("p", 4)], pc[("s", 4)])))

    base = None
    for name, gp, gs, pcp, pcs in arms:
        f = make_step(gp, gs, pcp, pcs)
        ms = timeit(f, o, d)
        mrays = 2 * R / (ms * 1e-3) / 1e6
        print(f"{name}: pc=({pcp},{pcs}) {ms:.2f} ms = {mrays:.2f} "
              f"Mrays/s", flush=True)
        if base is None:
            base = f(o, d)
        else:
            cur = f(o, d)
            dt = float(jnp.max(jnp.abs(cur[0] - base[0])))
            ds = int(jnp.sum(cur[1] != base[1]))
            print(f"  exactness vs first arm: max|dt|={dt:.2e}, "
                  f"shadow flips={ds}", flush=True)


if __name__ == "__main__":
    main()
