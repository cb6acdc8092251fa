"""MarchIntersector — the fused-kernel intersector (see
ops/pallas/block_march.py for the kernel design).

Host-side duties only: coherence-sort the wavefront (packets of similar
rays march through few clusters), pad to 128-ray blocks, unsort, and merge
the (few) analytic spheres.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from optix_ray_tracer_tpu.ops.intersect import (
    DEFAULT_T_MIN, Hit, PRIM_NONE, PRIM_TRIANGLE,
)
from optix_ray_tracer_tpu.ops.raysort import ray_sort_keys, sphere_bruteforce_merge
from optix_ray_tracer_tpu.ops.pallas.block_march import BLOCK_RAYS, block_march
from optix_ray_tracer_tpu.ops.sweep import (
    ClusterSet, build_clusters, rebuild_clusters, refit_clusters,
)
from optix_ray_tracer_tpu.scene.geometry import Scene
from optix_ray_tracer_tpu.utils.vecmath import INF

#: wavefront coherence-sort keys (MarchIntersector.sort_mode):
#: "morton" — origin+direction Morton; best for camera rays, no extra pass.
#: "probe"  — nearest-cluster id from a cull-only Pallas pass + direction
#:            Morton; groups INCOHERENT rays by where traversal starts,
#:            halving the block-union of needed clusters (measured on-chip:
#:            1.02 vs 0.62 Mrays/s on the 100k-tri incoherent bench).
SORT_MODES = ("morton", "probe")

#: scenes at or below this TRIANGLE count skip the coherence sort
#: entirely: at C <= ~8 real clusters the sort's fixed cost — the probe
#: pass + argsort + (R,8)/(R,4) pack/unsort gathers, measured ~30 ms per
#: 1M-ray wave — exceeds any possible visit savings (sorting can still
#: shrink a small block's cluster union, but never by enough to pay for
#: itself at this scale).  Tiny scenes (Cornell: 36 tris = 1 cluster)
#: pay this on EVERY bounce + shadow wave.  Sort-free waves also take
#: wide coherent blocks (union <= C keeps the visit count flat while the
#: per-visit scalar syncs amortize over 4x the lanes).  The gate is a
#: triangle count (8 default-CHUNK clusters), NOT a padded cluster
#: count, so it is stable under ORT_CHUNK sweeps.
SORT_FREE_TRIS = 2048

#: default sub-cluster schedule granularity for the raster engine
#: (ops/raster.py): pairs bin at CHUNK/g-triangle windows.  g=4
#: measured 18.7 -> 16.5 ms on the bench primary kernel (finer depth
#: retirement + 1/4 the woop bytes per pair; bit-exact — fine ids stay
#: contiguous in the sorted prim order).  ORT_RASTER_G overrides for
#: sweeps.
DEFAULT_GRANULARITY = int(__import__("os").environ.get(
    "ORT_RASTER_G", "4"))

#: granularity for OCCLUSION (any_hit) raster waves.  Granularity is a
#: PER-WAVE knob: nearest-hit waves profit from g=4 (byte floor + finer
#: depth retirement) but first-hit waves retire so fast that the 2.1x
#: pair inflation at g=4 is mostly schedule cost.  Full bench step,
#: per-wave calibrated caps (tools/mixedg_exp.py, round 5, bit-exact
#: across all arms): (g_near, g_occl) = (4,2) 48.3 ms beats (4,4) 49.1,
#: (1,1) 51.4 and the r4 shared-cap g=1 config 51.0.
DEFAULT_ANYHIT_GRANULARITY = int(__import__("os").environ.get(
    "ORT_RASTER_G_ANYHIT", "2"))


def ray_probe_keys(clusters, o, d, t_min, t_max):
    """(first-cluster id << 18) | direction-Morton — see SORT_MODES."""
    from optix_ray_tracer_tpu.ops.bvh import morton_codes
    from optix_ray_tracer_tpu.ops.pallas.block_march import (
        probe_first_cluster,
    )

    cid = probe_first_cluster(clusters, o, d, t_min, t_max)
    d_m = morton_codes(d, jnp.full(3, -1.0), jnp.full(3, 1.0))
    return (cid.astype(jnp.uint32) << 18) | (d_m.astype(jnp.uint32) >> 12)


@partial(jax.tree_util.register_dataclass,
         data_fields=("clusters", "scene_lo", "scene_hi", "raster"),
         meta_fields=("num_tris", "sort_mode", "bounce_radius"))
@dataclasses.dataclass(frozen=True)
class MarchIntersector:
    clusters: ClusterSet
    scene_lo: jax.Array
    scene_hi: jax.Array
    # per-scene raster tables (ops/raster.py), None until attach_raster —
    # enables intersect_from on common-origin waves
    raster: object | None = None
    # build-time triangle count (static): refit requires an identical count
    num_tris: int = 0
    # coherence-sort key (static; see SORT_MODES). Integrators switch to
    # "probe" for bounce/shadow waves via .for_incoherent()
    sort_mode: str = "morton"
    # static near-field cap for intersect_short_first (host scene
    # diagonal fraction at build time; 0 = uncalibrated)
    bounce_radius: float = 0.0

    def for_incoherent(self) -> "MarchIntersector":
        """Variant tuned for incoherent (bounce >= 1 / shadow) waves."""
        return dataclasses.replace(self, sort_mode="probe")

    def intersect_from(self, scene: Scene, o, d, mode: str = "origin",
                       point=None, t_min=DEFAULT_T_MIN, t_max=INF,
                       any_hit: bool = False, block_rays: int = 1024,
                       pc_max: int | None = None,
                       granularity: int | None = None) -> Hit:
        """Common-origin/-direction wave query via the tile-raster
        engine (ops/raster.py) — no coherence sort, no in-kernel picks;
        measured +33% over the sorted march on the bench's camera +
        point-light shadow waves (PERF.md round-3 "tile raster").

        Rays must arrive in a screen/hit-coherent layout (camera tile
        order); ``mode``/``point`` describe the shared point or
        direction.  EXACT at any pair count: on schedule-capacity
        overflow a lax.cond falls back to the block marcher for the
        whole wave (paying the marcher's cost for that wave only).

        Occlusion (``any_hit``) waves in "target" mode are re-traced
        FROM the common point: the segment [o + t_min*d, o + t_max*d]
        through p = o + dist*d is identical to [p + (dist-t_max)*(-d),
        p + (dist-t_min)*(-d)], and a common ORIGIN lets the kernel
        narrow its three o-projection dots to one lane column (see
        tile_raster._make_cluster_kernel) — the same win the camera
        wave gets.  Only ``is_hit`` of the returned Hit is meaningful
        for the flipped wave (t/u/v/prim describe the reversed
        parameterization; occluder identity, not the nearest one).
        """
        from optix_ray_tracer_tpu.ops.raster import raster_query

        if self.raster is None:
            raise ValueError("attach_raster(...) first — the raster "
                             "tables are built per scene")
        shape = o.shape[:-1]
        o2 = o.reshape(-1, 3)
        d2 = d.reshape(-1, 3)
        n = o2.shape[0]
        t_min_a = jnp.broadcast_to(
            jnp.asarray(t_min, jnp.float32).reshape(-1) if jnp.ndim(t_min)
            else jnp.asarray(t_min, jnp.float32), (n,))
        t_max_a = jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32).reshape(-1) if jnp.ndim(t_max)
            else jnp.asarray(t_max, jnp.float32), (n,))
        if any_hit and mode == "target":
            p = jnp.asarray(point, jnp.float32)
            dist = jnp.einsum("rk,rk->r", p[None, :] - o2, d2)
            o2 = jnp.broadcast_to(p, o2.shape)
            d2 = -d2
            t_min_a, t_max_a = dist - t_max_a, dist - t_min_a
            mode = "origin"
        if granularity is None:
            granularity = (DEFAULT_ANYHIT_GRANULARITY if any_hit
                           else DEFAULT_GRANULARITY)
        t, slot, u, v, ok = raster_query(
            self.raster, self.clusters, o2, d2, t_min_a, t_max_a,
            mode=mode, point=point, any_hit=any_hit,
            block_rays=block_rays, pc_max=pc_max,
            granularity=granularity)
        res = jax.lax.cond(
            ok,
            lambda _: (t, slot, u, v),
            lambda _: block_march(self.clusters, o2, d2, t_min_a, t_max_a,
                                  any_hit=any_hit, coherent=True),
            None)
        t, slot, u, v = res
        missed = slot < 0
        prim_id = self.clusters.prim_index[jnp.maximum(slot, 0)]
        hit = Hit(
            t=jnp.where(missed, INF, t),
            prim_type=jnp.where(missed, PRIM_NONE,
                                PRIM_TRIANGLE).astype(jnp.int32),
            prim_id=jnp.where(missed, 0, prim_id).astype(jnp.int32),
            u=jnp.where(missed, 0.0, u),
            v=jnp.where(missed, 0.0, v))
        if scene.sphere_count > 0:
            hit = sphere_bruteforce_merge(scene, o2, d2, t_min_a, t_max_a,
                                          hit)
        return jax.tree.map(lambda x: x.reshape(shape + x.shape[1:]), hit)

    def intersect_bundled(self, scene: Scene, o, d,
                          t_min=DEFAULT_T_MIN, t_max=INF,
                          any_hit: bool = False, block_rays: int = 1024,
                          pc_max: int | None = None,
                          granularity: int | None = None) -> Hit:
        """Arbitrary-ray wave query via 3-D bundle binning + the
        zero-pick pair kernel (ops/raster.py bundle_query) — the
        schedule-driven engine for SECONDARY waves (bounce rays, NEE
        shadow rays) whose origins are tile-coherent hit points but
        whose directions share no common point.

        Rays must arrive in a spatially coherent layout (screen-tile
        order — the bounce wave inherits the camera wave's tiling);
        dead lanes (t_max <= t_min) drop out of the block bounds, so
        dying waves shrink their schedules with no compaction pass.
        EXACT at any pair count: schedule overflow falls back to the
        sorted block marcher under lax.cond, like intersect_from.

        The reference analog is the RT-core dispatch of the recursive
        closest-hit rays (/root/reference/shader/Shader.cu:229-241).
        """
        from optix_ray_tracer_tpu.ops.raster import bundle_query

        shape = o.shape[:-1]
        o2 = o.reshape(-1, 3)
        d2 = d.reshape(-1, 3)
        n = o2.shape[0]
        t_min_a = jnp.broadcast_to(
            jnp.asarray(t_min, jnp.float32).reshape(-1) if jnp.ndim(t_min)
            else jnp.asarray(t_min, jnp.float32), (n,))
        t_max_a = jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32).reshape(-1) if jnp.ndim(t_max)
            else jnp.asarray(t_max, jnp.float32), (n,))
        if granularity is None:
            # bundles keep WHOLE-cluster windows: finer windows help
            # common-origin waves (fewer bytes on the byte-bound floor)
            # but secondary waves pair each block with 3.1x MORE
            # windows (142k vs 45.6k pairs on the bench bounce wave)
            # and lose 16% — measured, tools/octant_exp.py round-5
            granularity = 1
        t, slot, u, v, ok = bundle_query(
            self.clusters, o2, d2, t_min_a, t_max_a, any_hit=any_hit,
            block_rays=block_rays, pc_max=pc_max,
            granularity=granularity)
        res = jax.lax.cond(
            ok,
            lambda _: (t, slot, u, v),
            lambda _: block_march(self.clusters, o2, d2, t_min_a, t_max_a,
                                  any_hit=any_hit, coherent=False),
            None)
        t, slot, u, v = res
        missed = slot < 0
        prim_id = self.clusters.prim_index[jnp.maximum(slot, 0)]
        hit = Hit(
            t=jnp.where(missed, INF, t),
            prim_type=jnp.where(missed, PRIM_NONE,
                                PRIM_TRIANGLE).astype(jnp.int32),
            prim_id=jnp.where(missed, 0, prim_id).astype(jnp.int32),
            u=jnp.where(missed, 0.0, u),
            v=jnp.where(missed, 0.0, v))
        if scene.sphere_count > 0:
            hit = sphere_bruteforce_merge(scene, o2, d2, t_min_a, t_max_a,
                                          hit)
        return jax.tree.map(lambda x: x.reshape(shape + x.shape[1:]), hit)

    def intersect_short_first(self, scene: Scene, o, d,
                              t_min=DEFAULT_T_MIN, t_max=INF,
                              radius: float = 0.0,
                              block_rays: int = 1024,
                              pc_max: int | None = None) -> Hit:
        """Two-pass nearest hit for bounce waves: a bundle-engine pass
        capped at ``radius`` (the finite cap makes the 3-D binning's
        t-window prune effective — most bounce hits in closed scenes
        are NEAR), then the sorted marcher re-traces only the rays the
        capped pass left unresolved, over [radius(1-eps), t_max].

        Exact: pass 1 is exact within its window, so any hit it finds
        at t < radius is the global nearest; unresolved rays re-trace a
        window overlapping the cap boundary, so no t can fall in a gap.
        Resolved rays enter pass 2 with an empty window (t_max=0) —
        dead lanes compact into near-free marcher blocks.

        ``radius=0`` disables the cap (plain bundle + overflow
        fallback).  The reference's RT cores absorb this workload
        (/root/reference/shader/Shader.cu:229-241); the TPU answer is
        schedule-driven near-field binning + a sparse far-field sweep.
        """
        shape = o.shape[:-1]
        o2 = o.reshape(-1, 3)
        d2 = d.reshape(-1, 3)
        n = o2.shape[0]
        t_min_a = jnp.broadcast_to(
            jnp.asarray(t_min, jnp.float32).reshape(-1) if jnp.ndim(t_min)
            else jnp.asarray(t_min, jnp.float32), (n,))
        t_max_a = jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32).reshape(-1) if jnp.ndim(t_max)
            else jnp.asarray(t_max, jnp.float32), (n,))
        if radius <= 0.0:
            return self.intersect_bundled(
                scene, o, d, t_min=t_min, t_max=t_max,
                block_rays=block_rays, pc_max=pc_max)
        near = self.intersect_bundled(
            scene, o2, d2, t_min=t_min_a,
            t_max=jnp.minimum(t_max_a, radius), block_rays=block_rays,
            pc_max=pc_max)
        # unresolved = live rays the capped window didn't settle
        open_far = (~near.is_hit) & (t_max_a > radius)
        far_lo = jnp.maximum(t_min_a, radius * (1.0 - 1e-5))
        far = self.for_incoherent().intersect(
            scene, o2, d2, t_min=far_lo,
            t_max=jnp.where(open_far, t_max_a, 0.0))
        hit = jax.tree.map(
            lambda a, b: jnp.where(
                near.is_hit.reshape((-1,) + (1,) * (a.ndim - 1)), a, b),
            near, far)
        return jax.tree.map(lambda x: x.reshape(shape + x.shape[1:]), hit)

    def any_hit_from(self, scene: Scene, o, d, mode: str = "target",
                     point=None, t_min=DEFAULT_T_MIN, t_max=INF,
                     block_rays: int = 1024,
                     pc_max: int | None = None,
                     granularity: int | None = None):
        """Occlusion variant of :meth:`intersect_from` (shadow waves
        toward a point light use mode="target", sun shadows "ortho")."""
        return self.intersect_from(scene, o, d, mode=mode, point=point,
                                   t_min=t_min, t_max=t_max, any_hit=True,
                                   block_rays=block_rays,
                                   pc_max=pc_max,
                                   granularity=granularity).is_hit

    def intersect(self, scene: Scene, o, d, t_min=DEFAULT_T_MIN,
                  t_max=INF, _any_hit: bool = False) -> Hit:
        shape = o.shape[:-1]
        o2 = o.reshape(-1, 3)
        d2 = d.reshape(-1, 3)
        n = o2.shape[0]
        t_min_a = jnp.broadcast_to(
            jnp.asarray(t_min, jnp.float32).reshape(-1) if jnp.ndim(t_min)
            else jnp.asarray(t_min, jnp.float32), (n,))
        t_max_a = jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32).reshape(-1) if jnp.ndim(t_max)
            else jnp.asarray(t_max, jnp.float32), (n,))

        sort_free = self.num_tris <= SORT_FREE_TRIS
        if sort_free:
            # tiny scene: no sort, no gathers (see SORT_FREE_TRIS)
            o_s, d_s, tmin_s, tmax_s = o2, d2, t_min_a, t_max_a
        else:
            if self.sort_mode == "probe":
                key = ray_probe_keys(self.clusters, o2, d2, t_min_a,
                                     t_max_a)
            else:
                key = ray_sort_keys(o2, d2, self.scene_lo, self.scene_hi)
            perm = jnp.argsort(key)
            # ONE (R, 8) gather for the whole sorted ray state (separate
            # per-field gathers measurably dent incoherent throughput —
            # the XLA gather path runs ~5 GB/s, PERF.md)
            packed = jnp.concatenate(
                [o2, d2, t_min_a[:, None], t_max_a[:, None]], axis=1)[perm]
            o_s = packed[:, 0:3]
            d_s = packed[:, 3:6]
            tmin_s = packed[:, 6]
            tmax_s = packed[:, 7]

        pad = (-n) % BLOCK_RAYS
        if pad:
            o_s = jnp.pad(o_s, ((0, pad), (0, 0)))
            d_s = jnp.pad(d_s, ((0, pad), (0, 0)), constant_values=0.0)
            d_s = d_s.at[n:, 2].set(1.0)
            tmin_s = jnp.pad(tmin_s, (0, pad), constant_values=1.0)
            tmax_s = jnp.pad(tmax_s, (0, pad), constant_values=0.0)

        t, slot, u, v = block_march(
            self.clusters, o_s, d_s, tmin_s, tmax_s, any_hit=_any_hit,
            coherent=sort_free or self.sort_mode != "probe")
        if sort_free:
            t, slot, u, v = t[:n], slot[:n], u[:n], v[:n]
        else:
            inv = jnp.argsort(perm)
            # one (R, 4) unsort gather instead of four (R,) gathers
            out4 = jnp.stack([t, slot.astype(jnp.float32), u, v],
                             axis=1)[:n][inv]
            t = out4[:, 0]
            slot = out4[:, 1].astype(jnp.int32)
            u = out4[:, 2]
            v = out4[:, 3]

        missed = slot < 0
        prim_id = self.clusters.prim_index[jnp.maximum(slot, 0)]
        hit = Hit(
            t=jnp.where(missed, INF, t),
            prim_type=jnp.where(missed, PRIM_NONE,
                                PRIM_TRIANGLE).astype(jnp.int32),
            prim_id=jnp.where(missed, 0, prim_id).astype(jnp.int32),
            u=jnp.where(missed, 0.0, u),
            v=jnp.where(missed, 0.0, v))
        if scene.sphere_count > 0:
            hit = sphere_bruteforce_merge(scene, o2, d2, t_min_a, t_max_a,
                                           hit)
        return jax.tree.map(lambda x: x.reshape(shape + x.shape[1:]), hit)

    def __call__(self, scene: Scene, o, d, t_min=DEFAULT_T_MIN, t_max=INF) -> Hit:
        return self.intersect(scene, o, d, t_min, t_max)

    def any_hit(self, scene: Scene, o, d, t_min=DEFAULT_T_MIN, t_max=INF):
        return self.intersect(scene, o, d, t_min, t_max,
                              _any_hit=True).is_hit


def make_march_intersector(scene: Scene, method: str = "sah",
                           raster: bool = False) -> MarchIntersector:
    tv = np.asarray(scene.triangles.vertices)
    lo = tv.min(axis=(0, 1)) if tv.size else np.zeros(3)
    hi = tv.max(axis=(0, 1)) if tv.size else np.ones(3)
    # near-field cap for intersect_short_first: a scene-diagonal
    # fraction, fixed at build time (static — refit/rebuild keep it;
    # per-frame motion doesn't move the diagonal meaningfully)
    diag = float(np.linalg.norm(hi - lo))
    inter = MarchIntersector(
        clusters=build_clusters(tv, method=method),
        scene_lo=jnp.asarray(lo, jnp.float32),
        scene_hi=jnp.asarray(hi, jnp.float32),
        num_tris=int(tv.shape[0]),
        bounce_radius=0.125 * diag)
    return attach_raster(inter, scene) if raster else inter


def attach_raster(inter: MarchIntersector,
                  scene: Scene) -> MarchIntersector:
    """Derive the tile-raster tables (ops/raster.py) for this scene,
    enabling ``intersect_from`` / ``any_hit_from`` on common-origin
    waves.  Jittable; rebuild/refit keep the tables in sync."""
    from optix_ray_tracer_tpu.ops.raster import build_raster_set

    return dataclasses.replace(
        inter, raster=build_raster_set(inter.clusters,
                                       scene.triangles.vertices))


def rebuild_march_intersector(prev: MarchIntersector, scene: Scene,
                              method: str = "median") -> MarchIntersector:
    """Device-side full rebuild (fresh partition + refit, jittable) —
    the per-file buildGAS analog; see ops.sweep.rebuild_clusters.  Same
    triangle-count requirement as refit.  ``method``: "median" (default,
    SAH-class quality) or "morton" (single-sort, cheapest)."""
    tv = scene.triangles.vertices
    if tv.shape[0] != prev.num_tris:
        raise ValueError(
            f"rebuild requires the original triangle count ({prev.num_tris});"
            f" got {tv.shape[0]} — use make_march_intersector")
    out = MarchIntersector(
        clusters=rebuild_clusters(prev.clusters, tv, method=method),
        scene_lo=jnp.min(tv, axis=(0, 1)),
        scene_hi=jnp.max(tv, axis=(0, 1)),
        num_tris=prev.num_tris,
        sort_mode=prev.sort_mode,
        bounce_radius=prev.bounce_radius)
    return attach_raster(out, scene) if prev.raster is not None else out


def refit_march_intersector(prev: MarchIntersector,
                            scene: Scene) -> MarchIntersector:
    """Per-frame refit (device-side, jittable): new vertex positions, same
    Morton slot order — see ops.sweep.refit_clusters."""
    tv = scene.triangles.vertices
    if tv.shape[0] != prev.num_tris:
        raise ValueError(
            f"refit requires the build-time triangle count ({prev.num_tris});"
            f" got {tv.shape[0]} — rebuild with make_march_intersector")
    out = MarchIntersector(
        clusters=refit_clusters(prev.clusters, tv),
        scene_lo=jnp.min(tv, axis=(0, 1)),
        scene_hi=jnp.max(tv, axis=(0, 1)),
        num_tris=prev.num_tris,
        sort_mode=prev.sort_mode,
        bounce_radius=prev.bounce_radius)
    return attach_raster(out, scene) if prev.raster is not None else out
