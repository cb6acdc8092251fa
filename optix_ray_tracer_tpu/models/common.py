"""Shared frontend plumbing: config -> materials / extra geometry / camera.

Mirrors the commit-phase steps both reference frontends share
(``RendererMesh.cu:169-253`` / ``RendererTime.cu:153-290``): map material
data, build extra geometry, bake the color ramp, configure the camera.
"""

from __future__ import annotations

import numpy as np

from optix_ray_tracer_tpu.io.config import RendererConfig
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Spheres
from optix_ray_tracer_tpu.scene.materials import MaterialBuilder
from optix_ray_tracer_tpu.utils.colorramp import bake_color_ramp


def build_materials(config: RendererConfig, particle_count: int):
    """Materials = config roughs ++ config metals ++ baked particle ramp.

    Layout matches the reference's global material array: rough indices come
    first, metal indices after, then ``materialOffset`` = len(roughs) +
    len(metals) is the base of the per-particle ramp materials
    (RendererMesh.cu:223-233, ColorRamp baking keyed by max cell count).

    Returns (MaterialTable, rough_base=0, metal_base, material_offset).
    """
    mb = MaterialBuilder()
    for albedo in config.roughs:
        mb.add_rough(albedo)
    metal_base = len(config.roughs)
    for albedo, fuzz in config.metals:
        mb.add_metal(albedo, fuzz)
    material_offset = len(mb)
    if particle_count > 0:
        ramp = bake_color_ramp(config.particle_material_preset, particle_count)
        mb.add_ramp(ramp)
    return mb.build(), 0, metal_base, material_offset


def build_extra_spheres(config: RendererConfig, metal_base: int) -> Spheres:
    """Config ``spheres`` with their static SRT transforms pre-applied
    (parseSphereData precomputes the transforms, ProgramArgumentParser.cu:4-39;
    the default Main.cu callback then writes them onto instance 0)."""
    rows = []
    for s in config.spheres:
        center, radius = s.world_center_radius()
        mat = s.mat_index if s.mat_type == "ROUGH" else metal_base + s.mat_index
        rows.append((center, radius, mat))
    return Spheres.from_list(rows)


def camera_from_config(config: RendererConfig) -> Camera:
    ld = config.loop_data
    return Camera.look_at(ld.camera_center, ld.camera_target, ld.up_direction)


def frame_count_for_file(duration: float, fps: int, render_speed_ratio: int) -> int:
    """frames per animation segment = duration * fps * renderSpeedRatio
    (RendererMesh.cu:370-371)."""
    return max(1, int(duration * float(fps * render_speed_ratio)))


def pad_stack(arrays: list[np.ndarray], pad_value=0.0) -> np.ndarray:
    """Stack variable-length leading-dim arrays padded to the max length —
    the static-shape discipline that lets one compiled render serve every
    animation file."""
    if not arrays:
        return np.zeros((0, 0), np.float32)
    max_len = max(a.shape[0] for a in arrays)
    out = np.full((len(arrays), max_len) + arrays[0].shape[1:], pad_value,
                  arrays[0].dtype)
    for i, a in enumerate(arrays):
        out[i, :a.shape[0]] = a
    return out


def choose_intersector(scene):
    """Per-frame intersector choice for the render loops.

    Small scenes: chunked brute force (optimal under jit, no overhead).
    Larger scenes: the fused Pallas block marcher (ops/march.py) — all its
    ops (sort + one pallas call) are safe under an outer jit, unlike the
    per-lane-stack BVH path which faults at large wavefronts on TPU.
    """
    total = scene.triangle_count + scene.sphere_count
    if scene.triangle_count < 1024:
        return None  # brute force
    from optix_ray_tracer_tpu.ops.march import make_march_intersector
    return make_march_intersector(scene)


def refit_or_choose(prev, scene):
    """Per-frame intersector: device-side refit of ``prev`` when possible
    (same triangle count), full rebuild otherwise.

    The reference's accel policy (RendererImpl.cu:210-242): build the accel
    per file, *refit* it per animation frame.  Refit keeps the Morton slot
    order and recomputes Woop rows + AABBs on device — exact for any
    motion, no host round trip (see ops.sweep.refit_clusters).
    """
    from optix_ray_tracer_tpu.ops.march import (
        MarchIntersector, refit_march_intersector,
    )
    if (isinstance(prev, MarchIntersector)
            and scene.triangle_count == prev.num_tris):
        return refit_march_intersector(prev, scene)
    return choose_intersector(scene)
