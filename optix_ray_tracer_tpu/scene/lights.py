"""Area lights for next-event estimation.

The reference has no explicit lights — its Whitted tracer is lit entirely by
the miss-program background color (``shader/Shader.cu:276-287``).  The path
tracer (BASELINE configs 4/5) needs sampled area lights: emissive triangles
collected from the scene's material table, sampled by area with MIS-ready
solid-angle pdfs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from optix_ray_tracer_tpu.scene.geometry import Scene
from optix_ray_tracer_tpu.scene.materials import EMISSIVE, MaterialTable
from optix_ray_tracer_tpu.utils import rng
from optix_ray_tracer_tpu.utils.vecmath import dot, length_squared


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AreaLights:
    """Emissive-triangle table (SoA, device).

    v0/e1/e2:  (L, 3) triangle base + edges
    normal:    (L, 3) unit geometric normals
    emission:  (L, 3) radiance
    area:      (L,)
    cdf:       (L,) selection CDF, power-weighted (area x luminance) by
               default (last entry == 1)
    tri_id:    (L,) source triangle index (to ignore self-hits)
    total_area:() scalar
    pdf_scale: (L,) area-measure pdf of a point on light i under this
               selection strategy: P(select i) / area_i.  The solid-angle
               pdf at a shading point is dist^2 * pdf_scale / cos_light.
    tri_light_idx: (T,) dense scene-triangle -> light-row index (-1 for
               non-emissive triangles) — the MIS counterpart lookup for
               BSDF-sampled emitter hits, gathered by hit prim id; also
               supplies the light's GEOMETRIC normal so both sides of the
               MIS pair use the same cosine (the shading normal is
               interpolated/flipped and would desynchronize the weights
               on smooth-shaded emissive meshes).
    """
    v0: jax.Array
    e1: jax.Array
    e2: jax.Array
    normal: jax.Array
    emission: jax.Array
    area: jax.Array
    cdf: jax.Array
    tri_id: jax.Array
    total_area: jax.Array
    pdf_scale: jax.Array
    tri_light_idx: jax.Array

    @property
    def count(self) -> int:
        return self.v0.shape[0]


def collect_area_lights(scene: Scene, materials: MaterialTable,
                        power_weighted: bool = True) -> AreaLights | None:
    """Gather all emissive triangles (host-side, at scene commit).

    ``power_weighted`` selects lights proportionally to emitted power
    (area x luminance) instead of area alone — the standard variance
    reduction when lights differ in brightness; identical to area
    weighting when all emitters share one radiance.
    """
    import numpy as np

    if scene.triangle_count == 0:
        return None
    mtypes = np.asarray(materials.mtype)
    mids = np.asarray(scene.triangles.material_id)
    emissive_mask = mtypes[np.clip(mids, 0, len(mtypes) - 1)] == EMISSIVE
    ids = np.where(emissive_mask)[0]
    if len(ids) == 0:
        return None

    verts = np.asarray(scene.triangles.vertices)[ids]
    v0 = verts[:, 0]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    n = np.cross(e1, e2)
    area2 = np.linalg.norm(n, axis=-1)
    normal = n / np.maximum(area2[:, None], 1e-30)
    area = 0.5 * area2
    emission = np.asarray(materials.emission)[mids[ids]]
    total = float(area.sum())
    # selection weights: power (area x Rec.709 luminance) when requested
    # and meaningful, else area.  Equal-radiance emitters reduce to area
    # weighting exactly (the luminance factor cancels in the pdf).
    from optix_ray_tracer_tpu.utils.color import luminance
    lum = luminance(emission.astype(np.float32))
    weight = area * lum if power_weighted and float(lum.max()) > 0.0 else area
    total_weight = float(weight.sum())
    cdf = np.cumsum(weight) / max(total_weight, 1e-30)
    pdf_scale = weight / np.maximum(total_weight * area, 1e-30)
    tri_light_idx = np.full(scene.triangle_count, -1, np.int32)
    tri_light_idx[ids] = np.arange(len(ids), dtype=np.int32)
    return AreaLights(
        v0=jnp.asarray(v0, jnp.float32), e1=jnp.asarray(e1, jnp.float32),
        e2=jnp.asarray(e2, jnp.float32),
        normal=jnp.asarray(normal, jnp.float32),
        emission=jnp.asarray(emission, jnp.float32),
        area=jnp.asarray(area, jnp.float32),
        cdf=jnp.asarray(cdf, jnp.float32),
        tri_id=jnp.asarray(ids, jnp.int32),
        total_area=jnp.float32(total),
        pdf_scale=jnp.asarray(pdf_scale, jnp.float32),
        tri_light_idx=jnp.asarray(tri_light_idx))


def sample_lights(lights: AreaLights, shading_point, pixel_id, sample, bounce,
                  seed, mode: str = "pcg"):
    """Sample one point on the light set per shading point.

    Returns (direction (R,3) unit, distance (R,), pdf_solid_angle (R,),
    emitted (R,3), light_normal_cos (R,) cosine at the light).
    pdf is w.r.t. solid angle at the shading point (for MIS against BSDF
    pdfs); zero where the light faces away.
    """
    u1, u2, u3, _ = rng.uniform4(pixel_id, sample, bounce, seed, mode)
    if mode == "sobol":
        # give the 2D barycentric pair the strict (0,2)-sequence dims
        # (components 0,1); the discrete CDF pick rides dim 2
        u1, u2, u3 = u3, u1, u2
    # select triangle by area CDF
    li = jnp.searchsorted(lights.cdf, u1).astype(jnp.int32)
    li = jnp.clip(li, 0, lights.count - 1)
    v0 = lights.v0[li]
    e1 = lights.e1[li]
    e2 = lights.e2[li]
    # uniform barycentric (square-root warp)
    su = jnp.sqrt(jnp.maximum(u2, 1e-12))[..., None]
    b1 = 1.0 - su
    b2 = (u3[..., None]) * su
    point = v0 + b1 * e1 + b2 * e2

    to_light = point - shading_point
    dist2 = length_squared(to_light)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    w = to_light / dist[..., None]

    ln = lights.normal[li]
    cos_light = -dot(w, ln)
    # two-sided emitters: flip the normal toward the shading point
    cos_light = jnp.abs(cos_light)
    # pdf_area = P(select li) / area_li = pdf_scale[li] (uniform on the
    # selected triangle); convert to solid angle: pdf = dist^2 * scale / cos
    pdf = dist2 * lights.pdf_scale[li] / jnp.maximum(cos_light, 1e-12)
    pdf = jnp.where(cos_light > 1e-6, pdf, 0.0)
    emitted = lights.emission[li]
    return w, dist, pdf, emitted, cos_light


def light_pdf_solid_angle(lights: AreaLights, hit_tri_id, is_triangle,
                          direction, hit_t):
    """pdf (solid angle) that NEE would have produced this BSDF-sampled hit
    on an emissive triangle — the MIS counterpart of :func:`sample_lights`.

    ``is_triangle`` masks hits NEE could actually have sampled: emissive
    primitives outside the light table (e.g. spheres) get pdf 0, so the
    BSDF MIS weight correctly stays 1 for them.  The cosine uses the
    light's GEOMETRIC normal from the table — the same normal
    :func:`sample_lights` used — so the balance-heuristic weights of the
    two strategies sum to exactly 1 even on smooth-shaded emissive
    meshes (an interpolated shading normal here would desynchronize the
    pair).
    """
    n_tris = lights.tri_light_idx.shape[0]
    tid = jnp.clip(hit_tri_id, 0, max(n_tris - 1, 0))
    li = lights.tri_light_idx[tid]
    is_light = is_triangle & (li >= 0)
    lc = jnp.maximum(li, 0)
    scale = jnp.where(is_light, lights.pdf_scale[lc], 0.0)
    cos_light = jnp.abs(dot(direction, lights.normal[lc]))
    dist2 = hit_t * hit_t
    pdf = dist2 * scale / jnp.maximum(cos_light, 1e-12)
    # mirror sample_lights' grazing-angle cutoff (pdf 0 there -> the BSDF
    # strategy takes full weight on both sides)
    return jnp.where(cos_light > 1e-6, pdf, 0.0)
