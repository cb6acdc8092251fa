"""Product-level TLAS scene intersector (VERDICT r4 #6).

The Time frontend's default path FLATTENS instances into world-space
triangles per frame (models/renderer_time.py) — ~190 B/triangle of HBM
(vertices + normals + cluster tables).  The reference's IAS makes
thousands of instances free (``src/Global/RendererImpl.cu:174-242``):
geometry memory scales with the shape LIBRARY, per-frame state with the
instance count.  This module gives the integrators the same property on
TPU: it adapts the exact two-level engine (ops/instanced.py — TLAS
marcher + pair-binned TLAS raster) to the ``MarchIntersector`` API the
integrators consume, so a Time-mode scene whose flattened geometry
would not fit HBM still renders end-to-end.

Design (TPU-first):

* traversal is the instanced engine unchanged — camera/shadow waves via
  pair-binned rasterization, bounce waves via the sorted TLAS marcher;
* hits are mapped to a VIRTUAL flattened prim-id space — the id each
  triangle WOULD have in the packed flatten layout — so integrator
  code, AOVs, and the temporal reprojector see the exact id contract of
  the flatten path while no flattened geometry ever exists;
* shading gathers lazily: two int32 tables (8 B/triangle — the
  flatten's 190 B/triangle is what's being avoided) recover (library
  triangle, instance) from a virtual id, and the shading normal is the
  object-space library normal rotated by the instance pose at gather
  time (the reference's instance-transform normal path,
  ``shader/Shader.cu:121-162`` + the IAS transform);
* static extras (ground planes, lights, spheres) stay a real, small
  ``Scene`` — traced by the chunked brute-force kernels and merged by
  nearest-t; their virtual ids follow the dynamic block, matching the
  flatten path's ``tris.concat(extra)`` layout.

Integrators pick this shading path through
``ops.intersect.shading_frame_fn`` (an intersector that defines
``shading_frame`` shades its own hits).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from optix_ray_tracer_tpu.ops import intersect as isect
from optix_ray_tracer_tpu.ops.instanced import InstancedMarchIntersector
from optix_ray_tracer_tpu.ops.intersect import (
    DEFAULT_T_MIN, Hit, PRIM_TRIANGLE,
)
from optix_ray_tracer_tpu.utils.vecmath import INF, dot


def _merge_nearest(hd: Hit, hs: Hit) -> Hit:
    """Nearest-t merge of the dynamic (TLAS) and static (brute) hits."""
    take_d = hd.t < hs.t
    return Hit(
        t=jnp.where(take_d, hd.t, hs.t),
        prim_type=jnp.where(take_d, hd.prim_type, hs.prim_type),
        prim_id=jnp.where(take_d, hd.prim_id, hs.prim_id),
        u=jnp.where(take_d, hd.u, hs.u),
        v=jnp.where(take_d, hd.v, hs.v))


@partial(jax.tree_util.register_dataclass,
         data_fields=("tlas", "tri_lib", "tri_inst", "inst_base",
                      "inst_tri_off", "lib_normals", "rot", "pmat"),
         meta_fields=())
@dataclasses.dataclass(frozen=True)
class TLASSceneIntersector:
    """Integrator-facing TLAS intersector + lazy instanced shading.

    tlas:         the frame's exact two-level engine (refit per frame)
    tri_lib:      (T_pack,) int32 virtual slot -> library triangle id
    tri_inst:     (T_pack,) int32 virtual slot -> instance id
    inst_base:    (P,) int32 instance -> first virtual slot
    inst_tri_off: (P,) int32 instance -> its shape's library tri offset
    lib_normals:  (L, 3, 3) object-space library vertex normals
    rot:          (P, 3, 3) instance object->world rotations (the pose
                  that makes world normals; uniform scale drops out)
    pmat:         (P,) int32 instance material ids

    The ``scene`` argument of every query/shade call is the STATIC
    extras scene only; dynamic geometry lives in ``tlas``.  Virtual ids:
    dynamic block [0, T_pack) first, static triangles after — the
    flatten path's layout, so AOV prim ids and the temporal
    reprojector's tables keep working unchanged.
    """
    tlas: InstancedMarchIntersector
    tri_lib: jax.Array
    tri_inst: jax.Array
    inst_base: jax.Array
    inst_tri_off: jax.Array
    lib_normals: jax.Array
    rot: jax.Array
    pmat: jax.Array

    @property
    def n_dynamic(self) -> int:
        return self.tri_lib.shape[0]

    @property
    def raster(self):
        """Non-None marks the camera wave raster-routable
        (ops.raster.camera_tile_layout's probe)."""
        return self.tlas

    def for_incoherent(self):
        """Bounce waves: the TLAS marcher sorts rays itself."""
        return self

    # -- hit-space mapping ------------------------------------------------
    def _to_virtual(self, hit: Hit, inst_id) -> Hit:
        """(library prim, instance) -> virtual flattened prim id."""
        ii = jnp.maximum(inst_id, 0)
        local = hit.prim_id - self.inst_tri_off[ii]
        virt = self.inst_base[ii] + local
        ok = inst_id >= 0
        return Hit(t=hit.t, prim_type=hit.prim_type,
                   prim_id=jnp.where(ok, virt, 0).astype(jnp.int32),
                   u=hit.u, v=hit.v)

    def _static_shift(self, scene, hs: Hit) -> Hit:
        """Static triangle ids follow the dynamic block."""
        is_tri = hs.prim_type == PRIM_TRIANGLE
        return Hit(t=hs.t, prim_type=hs.prim_type,
                   prim_id=jnp.where(is_tri, hs.prim_id + self.n_dynamic,
                                     hs.prim_id),
                   u=hs.u, v=hs.v)

    # -- queries (MarchIntersector API shape) -----------------------------
    def intersect(self, scene, o, d, t_min=DEFAULT_T_MIN, t_max=INF,
                  _any_hit: bool = False) -> Hit:
        o2 = o.reshape(-1, 3)
        d2 = d.reshape(-1, 3)
        hd, inst = self.tlas.intersect(o2, d2, t_min, t_max, _any_hit)
        hd = self._to_virtual(hd, inst)
        hs = self._static_shift(
            scene, isect.intersect_scene_bruteforce(scene, o2, d2,
                                                    t_min, t_max))
        out = _merge_nearest(hd, hs)
        shape = o.shape[:-1]
        return jax.tree.map(lambda x: x.reshape(shape + x.shape[1:]), out)

    def any_hit(self, scene, o, d, t_min=DEFAULT_T_MIN, t_max=INF):
        o2 = o.reshape(-1, 3)
        d2 = d.reshape(-1, 3)
        occ = jnp.logical_or(
            self.tlas.any_hit(o2, d2, t_min, t_max),
            isect.intersect_any_bruteforce(scene, o2, d2, t_min, t_max))
        return occ.reshape(o.shape[:-1])

    def intersect_from(self, scene, o, d, mode: str = "origin",
                       point=None, t_min=DEFAULT_T_MIN, t_max=INF,
                       any_hit: bool = False, block_rays: int = 1024,
                       pc_max: int | None = None) -> Hit:
        """Common-origin/-direction wave via the pair-binned TLAS raster
        (ops/raster_instanced.py; falls back to the exact TLAS marcher
        on schedule overflow), merged with the static extras."""
        o2 = o.reshape(-1, 3)
        d2 = d.reshape(-1, 3)
        hd, inst = self.tlas.intersect_from(
            o2, d2, mode=mode, point=point, t_min=t_min, t_max=t_max,
            any_hit=any_hit, block_rays=block_rays, pc_max=pc_max)
        hd = self._to_virtual(hd, inst)
        if any_hit:
            occ = isect.intersect_any_bruteforce(scene, o2, d2,
                                                 t_min, t_max)
            # any-hit contract: only is_hit is meaningful
            hs = Hit(t=jnp.where(occ, 0.0, INF),
                     prim_type=jnp.where(occ, PRIM_TRIANGLE,
                                         isect.PRIM_NONE).astype(jnp.int32),
                     prim_id=jnp.zeros_like(hd.prim_id),
                     u=jnp.zeros_like(hd.u), v=jnp.zeros_like(hd.v))
        else:
            hs = self._static_shift(
                scene, isect.intersect_scene_bruteforce(scene, o2, d2,
                                                        t_min, t_max))
        out = _merge_nearest(hd, hs)
        shape = o.shape[:-1]
        return jax.tree.map(lambda x: x.reshape(shape + x.shape[1:]), out)

    def any_hit_from(self, scene, o, d, mode: str = "target", point=None,
                     t_min=DEFAULT_T_MIN, t_max=INF,
                     block_rays: int = 1024, pc_max: int | None = None):
        return self.intersect_from(
            scene, o, d, mode=mode, point=point, t_min=t_min, t_max=t_max,
            any_hit=True, block_rays=block_rays, pc_max=pc_max).is_hit

    # -- lazy instanced shading -------------------------------------------
    def shading_frame(self, scene, o, d, hit: Hit):
        """The module shading_frame contract (point, normal, front_face,
        material_id) with dynamic hits shaded from the LIBRARY: normals
        gathered object-space and rotated by the instance pose — no
        per-slot world-space normal array exists."""
        nd = self.n_dynamic
        is_tri = hit.prim_type == PRIM_TRIANGLE
        dynamic = jnp.logical_and(is_tri, hit.prim_id < nd)

        # static lanes through the plain scene tables (ids shifted back)
        hs = Hit(t=hit.t, prim_type=hit.prim_type,
                 prim_id=jnp.where(is_tri,
                                   jnp.maximum(hit.prim_id - nd, 0),
                                   hit.prim_id),
                 u=hit.u, v=hit.v)
        point, n_s, ff_s, m_s = isect.shading_frame(scene, o, d, hs)

        # dynamic lanes: lazy (library, instance) gather + pose rotation
        slot = jnp.clip(hit.prim_id, 0, max(nd - 1, 0))
        lib = self.tri_lib[slot]
        ii = self.tri_inst[slot]
        n123 = self.lib_normals[lib]                       # (R, 3, 3)
        r = self.rot[ii]                                   # (R, 3, 3)
        n123w = jnp.einsum("...ij,...kj->...ki", r, n123)
        w = (1.0 - hit.u - hit.v)[..., None]
        n_d = (w * n123w[..., 0, :] + hit.u[..., None] * n123w[..., 1, :]
               + hit.v[..., None] * n123w[..., 2, :])
        m_d = self.pmat[ii]
        # two-sided flip for the dynamic lanes only — the static path
        # already flipped (and its front_face feeds dielectrics)
        ff_d = dot(d, n_d) < 0.0
        n_d = jnp.where(ff_d[..., None], n_d, -n_d)

        normal = jnp.where(dynamic[..., None], n_d, n_s)
        material_id = jnp.where(dynamic, m_d, m_s)
        front_face = jnp.where(dynamic, ff_d, ff_s)
        return point, normal, front_face, material_id
