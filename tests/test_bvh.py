"""LBVH property tests: structure validity + exact agreement with the
brute-force oracle (SURVEY.md section 4 test strategy items b/c)."""

import numpy as np
import jax.numpy as jnp
import pytest

from optix_ray_tracer_tpu.ops.bvh import (
    build_lbvh, build_scene_lbvh, morton_codes, validate_lbvh,
)
from optix_ray_tracer_tpu.ops.intersect import intersect_scene_bruteforce
from optix_ray_tracer_tpu.ops.traverse import make_intersector
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles


def _random_scene(n_tri, n_sph, seed=0, spread=2.0):
    rng = np.random.default_rng(seed)
    tris = Triangles.empty()
    sph = Spheres.empty()
    if n_tri:
        c = rng.uniform(-spread, spread, (n_tri, 3)).astype(np.float32)
        tri = np.stack([c,
                        c + rng.normal(0, 0.2, (n_tri, 3)),
                        c + rng.normal(0, 0.2, (n_tri, 3))], 1)
        tris = Triangles.from_arrays(tri.astype(np.float32))
    if n_sph:
        sph = Spheres.from_list([
            (tuple(rng.uniform(-spread, spread, 3)),
             float(rng.uniform(0.05, 0.3)), 0) for _ in range(n_sph)])
    return Scene(spheres=sph, triangles=tris)


def _random_rays(n, seed=1, spread=4.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestMorton:
    def test_ordering_locality(self):
        # points on a diagonal should be monotone in morton order
        p = jnp.asarray(np.linspace(0, 1, 16)[:, None] * np.ones(3))
        codes = np.asarray(morton_codes(p, jnp.zeros(3), jnp.ones(3)))
        assert (np.diff(codes.astype(np.int64)) > 0).all()

    def test_range(self):
        rng = np.random.default_rng(0)
        p = jnp.asarray(rng.uniform(-3, 7, (100, 3)).astype(np.float32))
        codes = np.asarray(morton_codes(p, jnp.full(3, -3.0), jnp.full(3, 7.0)))
        assert (codes < (1 << 30)).all()


class TestBuild:
    @pytest.mark.parametrize("n", [2, 3, 7, 64, 1000])
    def test_structure_random(self, n):
        rng = np.random.default_rng(n)
        c = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        r = rng.uniform(0.01, 0.1, (n, 1)).astype(np.float32)
        bvh = build_lbvh(jnp.asarray(c - r), jnp.asarray(c + r), jnp.asarray(c))
        v = validate_lbvh(bvh)
        assert all(v.values()), v

    def test_structure_duplicate_positions(self):
        # all primitives at the same point -> all morton codes equal;
        # the index tiebreak must still build a valid tree
        n = 33
        c = np.zeros((n, 3), np.float32)
        r = np.full((n, 1), 0.1, np.float32)
        bvh = build_lbvh(jnp.asarray(c - r), jnp.asarray(c + r), jnp.asarray(c))
        v = validate_lbvh(bvh)
        assert all(v.values()), v

    def test_root_box_covers_scene(self):
        scene = _random_scene(200, 20, seed=3)
        bvh = build_scene_lbvh(scene)
        from optix_ray_tracer_tpu.ops.bvh import scene_primitive_bounds
        mins, maxs, _ = scene_primitive_bounds(scene)
        np.testing.assert_allclose(np.asarray(bvh.node_min[0]),
                                   np.asarray(jnp.min(mins, 0)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(bvh.node_max[0]),
                                   np.asarray(jnp.max(maxs, 0)), atol=1e-5)


class TestTraversal:
    @pytest.mark.parametrize("n_tri,n_sph", [(100, 0), (0, 100), (300, 50)])
    def test_matches_bruteforce(self, n_tri, n_sph):
        scene = _random_scene(n_tri, n_sph, seed=n_tri + n_sph)
        bi = make_intersector(scene)
        o, d = _random_rays(500)
        h_bvh = bi(scene, o, d)
        h_bf = intersect_scene_bruteforce(scene, o, d)
        np.testing.assert_allclose(np.asarray(h_bvh.t), np.asarray(h_bf.t),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(h_bvh.prim_type),
                                      np.asarray(h_bf.prim_type))
        np.testing.assert_array_equal(np.asarray(h_bvh.prim_id),
                                      np.asarray(h_bf.prim_id))

    def test_rays_from_inside(self):
        scene = _random_scene(200, 0, seed=9, spread=1.0)
        bi = make_intersector(scene)
        o, d = _random_rays(200, seed=2, spread=0.5)  # origins inside cloud
        h_bvh = bi(scene, o, d)
        h_bf = intersect_scene_bruteforce(scene, o, d)
        np.testing.assert_allclose(np.asarray(h_bvh.t), np.asarray(h_bf.t),
                                   rtol=1e-4, atol=1e-5)

    def test_any_hit(self):
        scene = _random_scene(100, 10, seed=5)
        bi = make_intersector(scene)
        o, d = _random_rays(300, seed=7)
        blocked = np.asarray(bi.any_hit(scene, o, d))
        ref = np.asarray(intersect_scene_bruteforce(scene, o, d).is_hit)
        np.testing.assert_array_equal(blocked, ref)

    def test_tiny_scene_falls_back(self):
        scene = _random_scene(1, 0)
        bi = make_intersector(scene)
        o, d = _random_rays(16)
        h = bi(scene, o, d)
        ref = intersect_scene_bruteforce(scene, o, d)
        np.testing.assert_allclose(np.asarray(h.t), np.asarray(ref.t))

    @pytest.mark.slow
    def test_render_with_bvh_matches_bruteforce_image(self):
        from optix_ray_tracer_tpu.render import wavefront
        from optix_ray_tracer_tpu.scene.camera import Camera
        from optix_ray_tracer_tpu.scene.materials import MaterialBuilder

        mb = MaterialBuilder()
        m = mb.add_rough((0.6, 0.4, 0.3))
        mats = mb.build()
        scene = _random_scene(200, 10, seed=13)
        cam = Camera.look_at((6.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0))

        img_bf, _, _ = wavefront.render(scene, mats, cam, 24, 16, spp=1, seed=5)
        bi = make_intersector(scene)
        img_bvh, _, _ = wavefront.render(scene, mats, cam, 24, 16, spp=1,
                                         seed=5, intersector=bi)
        np.testing.assert_allclose(np.asarray(img_bvh), np.asarray(img_bf),
                                   atol=1e-4)
