"""Cornell Box scene builder (BASELINE benchmark config 4).

Classic box: white floor/ceiling/back, red left wall, green right wall, one
rectangular area light under the ceiling, optionally two interior blocks.
Dimensionless unit box [0,1]^3 with the camera on +z looking -z.
"""

from __future__ import annotations

import numpy as np

from optix_ray_tracer_tpu.io.meshgen import box, quad
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles
from optix_ray_tracer_tpu.scene.materials import MaterialBuilder


def build_cornell_box(light_radiance=(15.0, 15.0, 15.0),
                      with_blocks: bool = True,
                      sphere_instead_of_tall_block: bool = False):
    """Returns (scene, materials, lights_camera) where lights must be
    collected by the caller via collect_area_lights (needs the materials)."""
    mb = MaterialBuilder()
    white = mb.add_rough((0.73, 0.73, 0.73))
    red = mb.add_rough((0.65, 0.05, 0.05))
    green = mb.add_rough((0.12, 0.45, 0.15))
    light = mb.add_emissive(light_radiance)
    mirror = mb.add_metal((0.9, 0.9, 0.9), 0.0)

    vs, ns, ms = [], [], []

    def add(vn, mat):
        v, n = vn
        vs.append(v)
        ns.append(n)
        ms.append(np.full(len(v), mat, np.int32))

    # floor (y=0), ceiling (y=1), back (z=0), left x=0 red, right x=1 green
    add(quad([0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]), white)   # floor
    add(quad([0, 1, 0], [0, 1, 1], [1, 1, 1], [1, 1, 0]), white)   # ceiling
    add(quad([0, 0, 0], [0, 1, 0], [1, 1, 0], [1, 0, 0]), white)   # back
    add(quad([0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0]), red)     # left
    add(quad([1, 0, 0], [1, 1, 0], [1, 1, 1], [1, 0, 1]), green)   # right

    # area light: 0.3x0.3 panel slightly below the ceiling
    add(quad([0.35, 0.999, 0.35], [0.65, 0.999, 0.35],
             [0.65, 0.999, 0.65], [0.35, 0.999, 0.65]), light)

    spheres = Spheres.empty()
    if with_blocks:
        add(box([0.12, 0.0, 0.10], [0.47, 0.60, 0.45]), white)     # tall
        if sphere_instead_of_tall_block:
            pass
        add(box([0.55, 0.0, 0.45], [0.85, 0.30, 0.75]), white)     # short
    if sphere_instead_of_tall_block:
        spheres = Spheres.from_list([((0.30, 0.75, 0.28), 0.12, mirror)])

    tris = Triangles.from_arrays(
        np.concatenate(vs, 0),
        np.concatenate(ns, 0),
        np.concatenate(ms, 0))
    scene = Scene(spheres=spheres, triangles=tris)
    materials = mb.build()

    camera = Camera.look_at((0.5, 0.5, 2.30), (0.5, 0.5, 0.0), (0.0, 1.0, 0.0))
    return scene, materials, camera
