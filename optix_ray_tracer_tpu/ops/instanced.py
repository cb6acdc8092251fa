"""Instance-level two-level traversal (TLAS) — object-space library
clusters + per-(instance, cluster) pair marching.

The reference's IAS is a real two-level structure: per-shape GAS built
once from the STL library (src/Global/RendererTime.cu:176-182) and an
instance AS of transforms refit per frame
(src/Global/RendererImpl.cu:174-242).  This module is the TPU-native
equivalent for the fused block marcher:

* the LIBRARY is clustered once in OBJECT space (geometry stored once
  per shape — memory scales with the library, not the instance count);
* each cull row of the march kernel is an (instance, library-cluster)
  PAIR whose world AABB is refit per frame from the instance pose (a
  few hundred FLOPs per pair — no vertex touching);
* a visit DMAs the pair's object-space cluster and transforms the RAY
  BLOCK into instance space (rigid + uniform scale, so the ray
  parameter t is identical in both spaces — see
  block_march.block_march_instanced).

Limits: pairs <= block_march.MAX_CLUSTERS (8192); transforms must be
rigid + uniform scale (the Time frontend's pose model,
RendererTime.cu:436-472).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from optix_ray_tracer_tpu.ops.intersect import DEFAULT_T_MIN, Hit, \
    PRIM_NONE, PRIM_TRIANGLE
from optix_ray_tracer_tpu.ops.pallas.block_march import (
    CLUSTER_TRIS, block_march_instanced,
)
from optix_ray_tracer_tpu.ops.sweep import SUBS_PER_CLUSTER, build_clusters
from optix_ray_tracer_tpu.utils.vecmath import INF


@partial(jax.tree_util.register_dataclass,
         data_fields=("woop_t", "woop", "prim_index",
                      "obj_cmin", "obj_cmax", "obj_smin", "obj_smax"),
         meta_fields=("shape_cluster_offset",))
@dataclasses.dataclass(frozen=True)
class InstancedLibrary:
    """Object-space cluster data for a ShapeLibrary, built once.

    woop_t:      (SC, 16, CHUNK) per-cluster transposed Woop rows
    woop:        (SC*CHUNK, 12) flat rows (u/v recompute)
    prim_index:  (SC*CHUNK,) sorted slot -> LIBRARY triangle id
    obj_*:       object-space cluster / sub-cluster AABBs
    shape_cluster_offset: (S+1,) host ints — shape s owns library
                 clusters [off[s], off[s+1])
    """
    woop_t: jax.Array
    woop: jax.Array
    prim_index: jax.Array
    obj_cmin: jax.Array
    obj_cmax: jax.Array
    obj_smin: jax.Array
    obj_smax: jax.Array
    shape_cluster_offset: tuple


def build_instanced_library(lib_vertices, offsets, counts
                            ) -> InstancedLibrary:
    """Cluster each shape of a packed library in object space."""
    lv = np.asarray(lib_vertices, np.float32)
    parts = []
    sco = [0]
    for s in range(len(counts)):
        lo = int(offsets[s])
        cs = build_clusters(lv[lo:lo + int(counts[s])])
        parts.append((cs, lo))
        sco.append(sco[-1] + cs.num_clusters)
    if not parts:
        raise ValueError("empty shape library")
    return InstancedLibrary(
        woop_t=jnp.concatenate([c.woop_t for c, _ in parts], axis=0),
        woop=jnp.concatenate([c.woop for c, _ in parts], axis=0),
        prim_index=jnp.concatenate(
            [c.prim_index + lo for c, lo in parts], axis=0),
        obj_cmin=jnp.concatenate([c.cluster_min for c, _ in parts], 0),
        obj_cmax=jnp.concatenate([c.cluster_max for c, _ in parts], 0),
        obj_smin=jnp.concatenate([c.sub_min for c, _ in parts], 0),
        obj_smax=jnp.concatenate([c.sub_max for c, _ in parts], 0),
        shape_cluster_offset=tuple(sco))


def make_pairs(library: InstancedLibrary, shape_ids) -> tuple:
    """(pair_shape, pair_inst) int32 host arrays for instances with the
    given shape ids — one pair per (instance, library cluster)."""
    sco = library.shape_cluster_offset
    ps, pi = [], []
    for p, s in enumerate(np.asarray(shape_ids)):
        for c in range(sco[int(s)], sco[int(s) + 1]):
            ps.append(c)
            pi.append(p)
    return (jnp.asarray(ps, jnp.int32), jnp.asarray(pi, jnp.int32))


@jax.jit
def refit_instanced(library: InstancedLibrary, pair_shape, pair_inst,
                    rot, shift, scale, valid):
    """Per-frame TLAS refit (the updateIAS analog) — world pair AABBs +
    packed world->object affines, all on device.

    rot: (P, 3, 3) object->world rotations; shift: (P, 3); scale: scalar
    uniform scale; valid: (P,) bool (invalid instances get NaN boxes =
    unreachable).  Returns (pair_min, pair_max, sub_min, sub_max,
    inst_rows)."""
    rot = jnp.asarray(rot, jnp.float32)
    shift = jnp.asarray(shift, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)

    # packed world->object affine rows: o' = A (o - b), A = R^T / s
    P = rot.shape[0]
    A = jnp.swapaxes(rot, 1, 2) / scale
    inst_rows = jnp.concatenate(
        [A.reshape(P, 9), shift,
         jnp.zeros((P, 128 - 12), jnp.float32)], axis=1)

    def world_boxes(omin, omax, rows_per_shape):
        idx = pair_shape * rows_per_shape
        if rows_per_shape > 1:
            idx = (idx[:, None]
                   + jnp.arange(rows_per_shape, dtype=jnp.int32)[None, :]
                   ).reshape(-1)
            pinst = jnp.repeat(pair_inst, rows_per_shape)
        else:
            pinst = pair_inst
        co = (omin[idx] + omax[idx]) * 0.5 * scale
        eo = (omax[idx] - omin[idx]) * 0.5 * scale
        r = rot[pinst]
        cw = jnp.einsum("pij,pj->pi", r, co) + shift[pinst]
        ew = jnp.einsum("pij,pj->pi", jnp.abs(r), eo)
        ok = valid[pinst, None]
        nan = jnp.float32(jnp.nan)
        return (jnp.where(ok, cw - ew, nan), jnp.where(ok, cw + ew, nan))

    pair_min, pair_max = world_boxes(library.obj_cmin, library.obj_cmax, 1)
    sub_min, sub_max = world_boxes(library.obj_smin, library.obj_smax,
                                   SUBS_PER_CLUSTER)
    return pair_min, pair_max, sub_min, sub_max, inst_rows


@partial(jax.tree_util.register_dataclass,
         data_fields=("library", "pair_shape", "pair_inst",
                      "pair_min", "pair_max", "sub_min", "sub_max",
                      "inst_rows", "scene_lo", "scene_hi"),
         meta_fields=())
@dataclasses.dataclass(frozen=True)
class InstancedMarchIntersector:
    """TLAS query object: library clusters + one frame's pair state.

    ``intersect`` returns (Hit, instance_id): Hit.prim_id is the LIBRARY
    triangle id; instance_id identifies the instance hit (-1 on miss).
    """
    library: InstancedLibrary
    pair_shape: jax.Array
    pair_inst: jax.Array
    pair_min: jax.Array
    pair_max: jax.Array
    sub_min: jax.Array
    sub_max: jax.Array
    inst_rows: jax.Array
    scene_lo: jax.Array
    scene_hi: jax.Array

    def _march_raw(self, o2, d2, t_min_a, t_max_a, any_hit: bool):
        """Sorted instanced march -> (t, slot, u, v) in caller order."""
        from optix_ray_tracer_tpu.ops.raysort import ray_sort_keys

        key = ray_sort_keys(o2, d2, self.scene_lo, self.scene_hi)
        perm = jnp.argsort(key)
        packed = jnp.concatenate(
            [o2, d2, t_min_a[:, None], t_max_a[:, None]], axis=1)[perm]
        t, slot, u, v = block_march_instanced(
            self.pair_min, self.pair_max, self.sub_min, self.sub_max,
            self.pair_shape, self.pair_inst, self.inst_rows,
            self.library.woop_t, self.library.woop,
            packed[:, 0:3], packed[:, 3:6], packed[:, 6], packed[:, 7],
            any_hit=any_hit)
        inv = jnp.argsort(perm)
        out4 = jnp.stack([t, slot.astype(jnp.float32), u, v], axis=1)[inv]
        return (out4[:, 0], out4[:, 1].astype(jnp.int32), out4[:, 2],
                out4[:, 3])

    def _to_hit(self, t, slot, u, v):
        """(t, slot, u, v) -> (Hit with LIBRARY prim ids, instance_id)."""
        missed = slot < 0
        pair = jnp.maximum(slot, 0) // CLUSTER_TRIS
        row = jnp.maximum(slot, 0) % CLUSTER_TRIS
        lib_slot = self.pair_shape[pair] * CLUSTER_TRIS + row
        prim_id = self.library.prim_index[lib_slot]
        inst_id = jnp.where(missed, -1, self.pair_inst[pair])
        hit = Hit(
            t=jnp.where(missed, INF, t),
            prim_type=jnp.where(missed, PRIM_NONE,
                                PRIM_TRIANGLE).astype(jnp.int32),
            prim_id=jnp.where(missed, 0, prim_id).astype(jnp.int32),
            u=jnp.where(missed, 0.0, u),
            v=jnp.where(missed, 0.0, v))
        return hit, inst_id

    def intersect(self, o, d, t_min=DEFAULT_T_MIN, t_max=INF,
                  _any_hit: bool = False):
        o2 = o.reshape(-1, 3)
        d2 = d.reshape(-1, 3)
        n = o2.shape[0]
        t_min_a = jnp.broadcast_to(
            jnp.asarray(t_min, jnp.float32).reshape(-1) if jnp.ndim(t_min)
            else jnp.asarray(t_min, jnp.float32), (n,))
        t_max_a = jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32).reshape(-1) if jnp.ndim(t_max)
            else jnp.asarray(t_max, jnp.float32), (n,))
        t, slot, u, v = self._march_raw(o2, d2, t_min_a, t_max_a,
                                        _any_hit)
        return self._to_hit(t, slot, u, v)

    def intersect_from(self, o, d, mode: str = "origin", point=None,
                       t_min=DEFAULT_T_MIN, t_max=INF,
                       any_hit: bool = False, block_rays: int = 1024,
                       pc_max: int | None = None):
        """Common-origin/-direction TLAS wave via pair-granularity
        raster binning (ops/raster_instanced.py) — zero picks, no ray
        sort, depth-sorted early-out at instance granularity; the
        in-kernel per-pair ray transform replaces the marcher's
        per-visit one.  Rays must arrive in a screen-tile-coherent
        layout.  EXACT at any pair count: schedule overflow falls back
        to the sorted instanced marcher under lax.cond (the cluster
        path's rule, ops/march.py intersect_from).

        Occlusion waves in "target" mode are re-traced FROM the common
        point (segment reversal, see ops/march.py) so the kernel can
        narrow its origin dots; only ``is_hit`` is meaningful then.

        Returns (Hit, instance_id) like :meth:`intersect`."""
        from optix_ray_tracer_tpu.ops.raster_instanced import (
            instanced_raster_query,
        )

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
        t, slot, u, v, ok = instanced_raster_query(
            self, o2, d2, t_min_a, t_max_a, mode=mode, point=point,
            any_hit=any_hit, block_rays=block_rays, pc_max=pc_max)
        t, slot, u, v = jax.lax.cond(
            ok,
            lambda _: (t, slot, u, v),
            lambda _: self._march_raw(o2, d2, t_min_a, t_max_a, any_hit),
            None)
        return self._to_hit(t, slot, u, v)

    def any_hit_from(self, o, d, mode: str = "target", point=None,
                     t_min=DEFAULT_T_MIN, t_max=INF,
                     block_rays: int = 1024, pc_max: int | None = None):
        """Occlusion variant of :meth:`intersect_from`."""
        hit, _ = self.intersect_from(
            o, d, mode=mode, point=point, t_min=t_min, t_max=t_max,
            any_hit=True, block_rays=block_rays, pc_max=pc_max)
        return hit.is_hit

    def any_hit(self, o, d, t_min=DEFAULT_T_MIN, t_max=INF):
        hit, _ = self.intersect(o, d, t_min, t_max, _any_hit=True)
        return hit.is_hit


def make_instanced_intersector(library: InstancedLibrary, shape_ids,
                               rot, shift, scale=1.0, valid=None
                               ) -> InstancedMarchIntersector:
    """Build the frame's TLAS intersector from instance poses."""
    pair_shape, pair_inst = make_pairs(library, shape_ids)
    P = np.asarray(shape_ids).shape[0]
    if valid is None:
        valid = jnp.ones((P,), bool)
    pmin, pmax, smin, smax, inst_rows = refit_instanced(
        library, pair_shape, pair_inst,
        jnp.asarray(rot, jnp.float32), jnp.asarray(shift, jnp.float32),
        jnp.asarray(scale, jnp.float32), valid)
    lo = jnp.nan_to_num(pmin, nan=jnp.inf).min(axis=0)
    hi = jnp.nan_to_num(pmax, nan=-jnp.inf).max(axis=0)
    return InstancedMarchIntersector(
        library=library, pair_shape=pair_shape, pair_inst=pair_inst,
        pair_min=pmin, pair_max=pmax, sub_min=smin, sub_max=smax,
        inst_rows=inst_rows, scene_lo=lo, scene_hi=hi)
