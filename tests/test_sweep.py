"""Cluster-sweep intersector tests: exact oracle agreement for the dense
wavefront design (XLA fallback and Pallas interpret paths)."""

import numpy as np
import jax.numpy as jnp
import pytest

from optix_ray_tracer_tpu.io.meshgen import sphere_with_n_triangles
from optix_ray_tracer_tpu.ops.intersect import intersect_scene_bruteforce
from optix_ray_tracer_tpu.ops.sweep import build_clusters, make_sweep_intersector
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles


def _mesh_scene(n_tri, with_ground=False):
    v, n = sphere_with_n_triangles(n_tri)
    sph = Spheres.from_list([((0, 0, -1000.5), 1000.0, 0)]) if with_ground \
        else Spheres.empty()
    return Scene(spheres=sph, triangles=Triangles.from_arrays(v, n))


def _rand_rays(n, seed=1, spread=2.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestClusters:
    def test_build_padding(self):
        scene = _mesh_scene(1000)
        cs = build_clusters(np.asarray(scene.triangles.vertices))
        from optix_ray_tracer_tpu.ops.sweep import CHUNK
        assert cs.woop.shape[0] % CHUNK == 0
        # padded woop rows are zero -> never hit
        assert float(jnp.abs(cs.woop[1000:]).sum()) == 0.0

    def test_partial_cluster_box_is_tight(self):
        # a mostly-padded cluster's box must bound only the real triangles
        scene = _mesh_scene(10)
        tv = np.asarray(scene.triangles.vertices)
        cs = build_clusters(tv)
        cmin = np.asarray(cs.cluster_min)[0]
        cmax = np.asarray(cs.cluster_max)[0]
        np.testing.assert_allclose(cmin, tv.min(axis=(0, 1)), atol=1e-6)
        np.testing.assert_allclose(cmax, tv.max(axis=(0, 1)), atol=1e-6)


class TestSweep:
    @pytest.mark.parametrize("n_tri", [10, 700, 20000])
    def test_coherent_matches_oracle(self, n_tri):
        scene = _mesh_scene(n_tri)
        si = make_sweep_intersector(scene)
        cam = Camera.look_at((3, 0, 0.3), (0, 0, 0), (0, 0, 1))
        o, d = cam.generate_rays(48, 48)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        h1 = si(scene, o, d)
        h2 = intersect_scene_bruteforce(scene, o, d)
        np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(h1.prim_id),
                                      np.asarray(h2.prim_id))

    @pytest.mark.slow
    def test_incoherent_and_inside(self):
        scene = _mesh_scene(20000, with_ground=True)
        si = make_sweep_intersector(scene)
        for seed, spread in ((3, 2.0), (4, 0.5)):
            o, d = _rand_rays(2048, seed=seed, spread=spread)
            h1 = si(scene, o, d)
            h2 = intersect_scene_bruteforce(scene, o, d)
            tri = np.asarray(h2.prim_type) == 2
            # triangle hits exact; giant-sphere hits within fp noise
            np.testing.assert_allclose(np.asarray(h1.t)[tri],
                                       np.asarray(h2.t)[tri],
                                       rtol=1e-3, atol=1e-4)
            np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                                       rtol=5e-3, atol=1e-3)
            np.testing.assert_array_equal(np.asarray(h1.prim_id),
                                          np.asarray(h2.prim_id))

    def test_per_ray_tmax(self):
        scene = _mesh_scene(5000)
        si = make_sweep_intersector(scene)
        o, d = _rand_rays(1024, seed=7)
        full = si(scene, o, d)
        cap = jnp.where(full.is_hit, full.t * 0.99, 0.5)
        capped = si(scene, o, d, t_max=cap)
        removed = np.asarray(full.is_hit & ~capped.is_hit)
        assert removed[np.asarray(full.is_hit)].mean() > 0.95

    def test_pallas_interpret_matches_xla(self):
        scene = _mesh_scene(5000)
        cam = Camera.look_at((3, 0, 0.3), (0, 0, 0), (0, 0, 1))
        o, d = cam.generate_rays(32, 32)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        h_x = make_sweep_intersector(scene, use_pallas=False)(scene, o, d)
        h_p = make_sweep_intersector(scene, use_pallas=True)(scene, o, d)
        np.testing.assert_allclose(np.asarray(h_x.t), np.asarray(h_p.t),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(h_x.prim_id),
                                      np.asarray(h_p.prim_id))

    def test_render_image_matches(self):
        from optix_ray_tracer_tpu.render import wavefront
        from optix_ray_tracer_tpu.scene.materials import MaterialBuilder
        mb = MaterialBuilder()
        m = mb.add_rough((0.6, 0.4, 0.3))
        mats = mb.build()
        scene = _mesh_scene(3000)
        cam = Camera.look_at((3, 0, 0.3), (0, 0, 0), (0, 0, 1))
        img_bf, _, _ = wavefront.render(scene, mats, cam, 24, 16, spp=1,
                                        seed=5, jitter=False)
        si = make_sweep_intersector(scene)
        img_sw, _, _ = wavefront.render(scene, mats, cam, 24, 16, spp=1,
                                        seed=5, intersector=si, jitter=False)
        diff = np.abs(np.asarray(img_bf) - np.asarray(img_sw))
        assert np.median(diff) < 1e-5
