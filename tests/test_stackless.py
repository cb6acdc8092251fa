"""Stackless bitstack traversal tests: exact agreement with the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from optix_ray_tracer_tpu.io.meshgen import sphere_with_n_triangles
from optix_ray_tracer_tpu.ops.intersect import intersect_scene_bruteforce
from optix_ray_tracer_tpu.ops.stackless import (
    build_flat_bvh, make_stackless_intersector,
)
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles


def _rand_scene(n_tri, n_sph=0, seed=0, spread=2.0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-spread, spread, (n_tri, 3)).astype(np.float32)
    tri = np.stack([c, c + rng.normal(0, 0.2, (n_tri, 3)),
                    c + rng.normal(0, 0.2, (n_tri, 3))], 1).astype(np.float32)
    sph = Spheres.empty()
    if n_sph:
        sph = Spheres.from_list([
            (tuple(rng.uniform(-spread, spread, 3)),
             float(rng.uniform(0.05, 0.3)), 0) for _ in range(n_sph)])
    return Scene(spheres=sph, triangles=Triangles.from_arrays(tri))


def _rand_rays(n, seed=1, spread=4.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestStackless:
    @pytest.mark.parametrize("n_tri", [1, 3, 4, 5, 33, 500])
    def test_matches_oracle_sizes(self, n_tri):
        scene = _rand_scene(n_tri, seed=n_tri)
        si = make_stackless_intersector(scene)
        o, d = _rand_rays(400, seed=n_tri + 1)
        h1 = si(scene, o, d)
        h2 = intersect_scene_bruteforce(scene, o, d)
        np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(h1.prim_id),
                                      np.asarray(h2.prim_id))

    def test_mixed_scene_with_spheres(self):
        scene = _rand_scene(300, n_sph=20, seed=7)
        si = make_stackless_intersector(scene)
        o, d = _rand_rays(500, seed=8)
        h1 = si(scene, o, d)
        h2 = intersect_scene_bruteforce(scene, o, d)
        np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(h1.prim_type),
                                      np.asarray(h2.prim_type))

    def test_per_ray_tmax_shadow(self):
        scene = _rand_scene(200, seed=3)
        si = make_stackless_intersector(scene)
        o, d = _rand_rays(300, seed=4)
        full = si(scene, o, d)
        # cap t_max just below each hit -> those rays must miss
        cap = jnp.where(full.is_hit, full.t * 0.99, 0.5)
        capped = si(scene, o, d, t_max=cap)
        hits_removed = np.asarray(full.is_hit & ~capped.is_hit)
        assert hits_removed[np.asarray(full.is_hit)].mean() > 0.95

    def test_mesh_camera_rays(self):
        v, n = sphere_with_n_triangles(3000)
        scene = Scene(spheres=Spheres.empty(),
                      triangles=Triangles.from_arrays(v, n))
        si = make_stackless_intersector(scene)
        cam = Camera.look_at((3, 0, 0), (0, 0, 0), (0, 0, 1))
        o, d = cam.generate_rays(64, 64)
        h1 = si(scene, o.reshape(-1, 3), d.reshape(-1, 3))
        h2 = intersect_scene_bruteforce(scene, o.reshape(-1, 3),
                                        d.reshape(-1, 3))
        np.testing.assert_array_equal(np.asarray(h1.prim_id),
                                      np.asarray(h2.prim_id))

    def test_render_image_matches(self):
        from optix_ray_tracer_tpu.render import wavefront
        from optix_ray_tracer_tpu.scene.materials import MaterialBuilder
        mb = MaterialBuilder()
        m = mb.add_rough((0.6, 0.4, 0.3))
        mats = mb.build()
        scene = _rand_scene(300, n_sph=5, seed=11)
        cam = Camera.look_at((6, 0, 0), (0, 0, 0), (0, 0, 1))
        img_bf, _, _ = wavefront.render(scene, mats, cam, 24, 16, spp=1,
                                        seed=5, jitter=False)
        si = make_stackless_intersector(scene)
        img_sl, _, _ = wavefront.render(scene, mats, cam, 24, 16, spp=1,
                                        seed=5, intersector=si, jitter=False)
        diff = np.abs(np.asarray(img_bf) - np.asarray(img_sl))
        assert np.median(diff) < 1e-5
