"""Fused block-march intersector tests (Pallas interpret on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from optix_ray_tracer_tpu.io.meshgen import sphere_with_n_triangles
from optix_ray_tracer_tpu.ops.intersect import intersect_scene_bruteforce
from optix_ray_tracer_tpu.ops.march import make_march_intersector
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles


def _scene(n_tri, ground=False):
    v, n = sphere_with_n_triangles(n_tri)
    sph = Spheres.from_list([((0, 0, -1000.5), 1000.0, 0)]) if ground \
        else Spheres.empty()
    return Scene(spheres=sph, triangles=Triangles.from_arrays(v, n))


class TestMarch:
    @pytest.mark.parametrize("n_tri", [60, 2000, 20000])
    def test_matches_oracle(self, n_tri):
        scene = _scene(n_tri)
        mi = make_march_intersector(scene)
        cam = Camera.look_at((3, 0, 0.3), (0, 0, 0), (0, 0, 1))
        o, d = cam.generate_rays(32, 24)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        h1 = mi(scene, o, d)
        h2 = intersect_scene_bruteforce(scene, o, d)
        np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(h1.prim_id),
                                      np.asarray(h2.prim_id))

    def test_cluster_cap_is_loud(self, monkeypatch):
        """Past MAX_CLUSTERS the marcher refuses with a clear error (the
        VERDICT-r2 #7 'loud ceiling'; cap lowered here so the boundary is
        exercised at CPU-testable scale)."""
        from optix_ray_tracer_tpu.ops.pallas import block_march as bm

        scene = _scene(20000)   # 79 clusters at CHUNK=256
        mi = make_march_intersector(scene)
        o = jnp.zeros((128, 3), jnp.float32)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (128, 1))
        monkeypatch.setattr(bm, "MAX_CLUSTERS", 64)
        with pytest.raises(ValueError, match="caps at 64 clusters"):
            mi(scene, o, d)

    def test_incoherent_with_spheres(self):
        scene = _scene(5000, ground=True)
        mi = make_march_intersector(scene)
        rng = np.random.default_rng(3)
        o = jnp.asarray(rng.uniform(-1, 1, (512, 3)).astype(np.float32))
        dd = rng.normal(size=(512, 3)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
        d = jnp.asarray(dd)
        h1 = mi(scene, o, d)
        h2 = intersect_scene_bruteforce(scene, o, d)
        np.testing.assert_array_equal(np.asarray(h1.prim_id),
                                      np.asarray(h2.prim_id))
        np.testing.assert_array_equal(np.asarray(h1.prim_type),
                                      np.asarray(h2.prim_type))

    @pytest.mark.parametrize("n_tri", [1500, 5000])
    def test_probe_variant_matches_oracle(self, n_tri):
        """The .for_incoherent() variant (probe sort + pair-merged sub
        boxes, block_march._wave_sub_boxes) stays exact — including the
        sort-free path (n_tri <= SORT_FREE_TRIS skips the probe sort and
        takes wide coherent blocks: exactly the Cornell bounce/shadow
        wave combination, ADVICE r4)."""
        scene = _scene(n_tri, ground=True)
        mi = make_march_intersector(scene).for_incoherent()
        rng = np.random.default_rng(13)
        o = jnp.asarray(rng.uniform(-1, 1, (512, 3)).astype(np.float32))
        dd = rng.normal(size=(512, 3)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
        d = jnp.asarray(dd)
        h1 = mi(scene, o, d)
        h2 = intersect_scene_bruteforce(scene, o, d)
        np.testing.assert_array_equal(np.asarray(h1.prim_id),
                                      np.asarray(h2.prim_id))

    def test_shadow_bounds(self):
        scene = _scene(3000)
        mi = make_march_intersector(scene)
        rng = np.random.default_rng(5)
        o = jnp.asarray(rng.uniform(-1, 1, (256, 3)).astype(np.float32))
        dd = rng.normal(size=(256, 3)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
        d = jnp.asarray(dd)
        full = mi(scene, o, d)
        cap = jnp.where(full.is_hit, full.t * 0.99, 0.5)
        capped = mi(scene, o, d, t_max=cap)
        removed = np.asarray(full.is_hit & ~capped.is_hit)
        assert removed[np.asarray(full.is_hit)].mean() > 0.95

    @pytest.mark.slow
    def test_render_image_matches(self):
        from optix_ray_tracer_tpu.render import wavefront
        from optix_ray_tracer_tpu.scene.materials import MaterialBuilder
        mb = MaterialBuilder()
        m = mb.add_rough((0.6, 0.4, 0.3))
        mats = mb.build()
        scene = _scene(2000)
        cam = Camera.look_at((3, 0, 0.3), (0, 0, 0), (0, 0, 1))
        img_bf, _, _ = wavefront.render(scene, mats, cam, 16, 16, spp=1,
                                        seed=5, jitter=False)
        mi = make_march_intersector(scene)
        img_m, _, _ = wavefront.render(scene, mats, cam, 16, 16, spp=1,
                                       seed=5, intersector=mi, jitter=False)
        diff = np.abs(np.asarray(img_bf) - np.asarray(img_m))
        assert np.median(diff) < 1e-5

    @pytest.mark.slow
    def test_any_hit_matches_oracle(self):
        from optix_ray_tracer_tpu.ops.intersect import intersect_any_bruteforce
        scene = _scene(3000, ground=True)
        mi = make_march_intersector(scene)
        rng = np.random.default_rng(9)
        o = jnp.asarray(rng.uniform(-1, 1, (256, 3)).astype(np.float32))
        dd = rng.normal(size=(256, 3)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
        d = jnp.asarray(dd)
        full = mi(scene, o, d)
        cap = jnp.where(full.is_hit, full.t + 0.1, 0.7)
        got = np.asarray(mi.any_hit(scene, o, d, t_max=cap))
        ref = np.asarray(intersect_any_bruteforce(scene, o, d, t_max=cap))
        np.testing.assert_array_equal(got, ref)

    def test_refit_exact_after_motion(self):
        """Device-side refit stays exact (oracle prim-id equality) even
        when the frame-0 Morton order is completely stale."""
        from optix_ray_tracer_tpu.ops.march import refit_march_intersector
        v, n = sphere_with_n_triangles(5000)
        scene0 = Scene(spheres=Spheres.empty(),
                       triangles=Triangles.from_arrays(v, n))
        mi = make_march_intersector(scene0)

        # violent motion: rotate 180deg, translate, squash
        rot = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1]], np.float32)
        v2 = (v.reshape(-1, 3) @ rot.T).reshape(v.shape)
        v2 = v2 * np.array([1.0, 0.4, 1.7], np.float32) + \
            np.array([2.0, -1.0, 0.5], np.float32)
        scene1 = Scene(spheres=Spheres.empty(),
                       triangles=Triangles.from_arrays(v2, n))
        mi2 = refit_march_intersector(mi, scene1)

        cam = Camera.look_at((6, -1, 1.2), (2, -1, 0.5), (0, 0, 1))
        o, d = cam.generate_rays(32, 24)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        h1 = mi2(scene1, o, d)
        h2 = intersect_scene_bruteforce(scene1, o, d)
        assert np.asarray(h2.is_hit).mean() > 0.2   # scene actually in view
        np.testing.assert_array_equal(np.asarray(h1.prim_id),
                                      np.asarray(h2.prim_id))
        np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                                   rtol=1e-3, atol=1e-4)

    def test_refit_identity_matches_build(self):
        """Refit with unchanged vertices reproduces fresh-build results."""
        from optix_ray_tracer_tpu.ops.march import refit_march_intersector
        scene = _scene(3000)
        mi = make_march_intersector(scene)
        mi2 = refit_march_intersector(mi, scene)
        cam = Camera.look_at((3, 0, 0.3), (0, 0, 0), (0, 0, 1))
        o, d = cam.generate_rays(24, 16)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        h1 = mi(scene, o, d)
        h2 = mi2(scene, o, d)
        np.testing.assert_array_equal(np.asarray(h1.prim_id),
                                      np.asarray(h2.prim_id))
        np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                                   rtol=1e-5, atol=1e-6)


class TestRebuild:
    def test_rebuild_exact_after_motion(self):
        """Device-side rebuild (fresh Morton order + refit, jittable)
        stays exact vs the oracle after violent motion, and its cull
        order matches a fresh host build (same Morton codes)."""
        from optix_ray_tracer_tpu.ops.march import rebuild_march_intersector
        v, n = sphere_with_n_triangles(5000)
        scene0 = Scene(spheres=Spheres.empty(),
                       triangles=Triangles.from_arrays(v, n))
        mi = make_march_intersector(scene0)

        rot = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        v2 = (v.reshape(-1, 3) @ rot.T).reshape(v.shape)
        v2 = v2 * np.array([0.5, 1.9, 1.1], np.float32) + \
            np.array([-1.0, 2.0, 0.3], np.float32)
        scene1 = Scene(spheres=Spheres.empty(),
                       triangles=Triangles.from_arrays(v2, n))
        mi2 = rebuild_march_intersector(mi, scene1)

        cam = Camera.look_at((3, 2, 0.8), (-1, 2, 0.3), (0, 0, 1))
        o, d = cam.generate_rays(32, 24)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        h1 = mi2(scene1, o, d)
        h2 = intersect_scene_bruteforce(scene1, o, d)
        assert np.asarray(h2.is_hit).mean() > 0.2
        np.testing.assert_array_equal(np.asarray(h1.prim_id),
                                      np.asarray(h2.prim_id))
        np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                                   rtol=1e-3, atol=1e-4)

    def test_rebuild_matches_host_build(self):
        """The device MORTON rebuild reproduces a fresh host Morton
        build's cluster boxes (same codes) on the moved geometry."""
        from optix_ray_tracer_tpu.ops.march import rebuild_march_intersector
        v, n = sphere_with_n_triangles(2000)
        v2 = v + np.array([0.3, -0.2, 0.1], np.float32)
        scene1 = Scene(spheres=Spheres.empty(),
                       triangles=Triangles.from_arrays(v2, n))
        mi0 = make_march_intersector(
            Scene(spheres=Spheres.empty(),
                  triangles=Triangles.from_arrays(v, n)))
        dev = rebuild_march_intersector(mi0, scene1, method="morton")
        host = make_march_intersector(scene1, method="morton")
        np.testing.assert_allclose(np.asarray(dev.clusters.cluster_min),
                                   np.asarray(host.clusters.cluster_min),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(dev.clusters.prim_index),
                                      np.asarray(host.clusters.prim_index))

    def test_median_rebuild_quality_and_validity(self):
        """The default (median-split) device rebuild yields a valid
        permutation and tighter cluster boxes than Morton chunking."""
        from optix_ray_tracer_tpu.ops.march import rebuild_march_intersector
        v, n = sphere_with_n_triangles(5000)
        scene = Scene(spheres=Spheres.empty(),
                      triangles=Triangles.from_arrays(v, n))
        mi0 = make_march_intersector(scene, method="morton")
        med = rebuild_march_intersector(mi0, scene)          # median default
        mor = rebuild_march_intersector(mi0, scene, method="morton")

        n_tris = v.shape[0]
        pi = np.asarray(med.clusters.prim_index)[:n_tris]
        assert sorted(pi.tolist()) == list(range(n_tris))    # permutation

        def total_sa(cs):
            d = np.asarray(cs.cluster_max) - np.asarray(cs.cluster_min)
            sa = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 0] * d[:, 2]
            return float(np.nansum(sa))

        # measured ~2.8x on this scene; assert a conservative margin
        assert total_sa(med.clusters) < 0.6 * total_sa(mor.clusters)

        cam = Camera.look_at((3, 0, 0.3), (0, 0, 0), (0, 0, 1))
        o, d = cam.generate_rays(32, 24)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        h1 = med(scene, o, d)
        h2 = intersect_scene_bruteforce(scene, o, d)
        np.testing.assert_array_equal(np.asarray(h1.prim_id),
                                      np.asarray(h2.prim_id))


class TestHierMarch:
    """Hierarchical (supercluster) kernel variant: same exact results as
    the flat marcher and the brute-force oracle."""

    @pytest.mark.parametrize("n_tri", [60, 20000])
    def test_matches_oracle(self, n_tri):
        from optix_ray_tracer_tpu.ops.pallas.block_march import (
            block_march_hier,
        )
        from optix_ray_tracer_tpu.utils.vecmath import INF

        scene = _scene(n_tri)
        mi = make_march_intersector(scene)
        cam = Camera.look_at((3, 0, 0.3), (0, 0, 0), (0, 0, 1))
        o, d = cam.generate_rays(32, 24)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        n = o.shape[0]
        tmin = jnp.full((n,), 1e-3, jnp.float32)
        tmax = jnp.full((n,), INF, jnp.float32)
        t, slot, u, v = block_march_hier(mi.clusters, o, d, tmin, tmax)
        h2 = intersect_scene_bruteforce(scene, o, d, t_min=1e-3)
        prim = np.where(np.asarray(slot) < 0, 0,
                        np.asarray(mi.clusters.prim_index)[
                            np.maximum(np.asarray(slot), 0)])
        hit2 = np.asarray(h2.prim_type) == 2
        np.testing.assert_array_equal(np.asarray(slot) >= 0, hit2)
        np.testing.assert_array_equal(prim[hit2],
                                      np.asarray(h2.prim_id)[hit2])
        np.testing.assert_allclose(np.asarray(t)[hit2],
                                   np.asarray(h2.t)[hit2],
                                   rtol=1e-3, atol=1e-4)

    @pytest.mark.slow
    def test_incoherent_matches_flat(self):
        from optix_ray_tracer_tpu.ops.pallas.block_march import (
            block_march, block_march_hier,
        )
        from optix_ray_tracer_tpu.utils.vecmath import INF

        scene = _scene(20000)
        mi = make_march_intersector(scene)
        rng = np.random.default_rng(9)
        n = 512
        o = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32))
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d)
        tmin = jnp.full((n,), 1e-3, jnp.float32)
        tmax = jnp.full((n,), INF, jnp.float32)
        tf, sf, _, _ = block_march(mi.clusters, o, d, tmin, tmax)
        th, sh, _, _ = block_march_hier(mi.clusters, o, d, tmin, tmax)
        np.testing.assert_array_equal(np.asarray(sf), np.asarray(sh))
        np.testing.assert_allclose(np.asarray(tf), np.asarray(th),
                                   rtol=1e-6, atol=1e-6)
        # occlusion query parity
        _, sf2, _, _ = block_march(mi.clusters, o, d, tmin, tmax,
                                   any_hit=True)
        _, sh2, _, _ = block_march_hier(mi.clusters, o, d, tmin, tmax,
                                        any_hit=True)
        np.testing.assert_array_equal(np.asarray(sf2) >= 0,
                                      np.asarray(sh2) >= 0)

    @pytest.mark.slow
    def test_auto_delegation_policy(self, monkeypatch):
        """block_march routes to the hierarchical kernel past
        HIER_MIN_CLUSTERS (threshold lowered here to exercise the path
        at CPU-testable scale)."""
        from optix_ray_tracer_tpu.ops.pallas import block_march as bm

        scene = _scene(20000)   # 40 clusters
        mi = make_march_intersector(scene)
        cam = Camera.look_at((3, 0, 0.3), (0, 0, 0), (0, 0, 1))
        o, d = cam.generate_rays(16, 16)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        h_flat = mi(scene, o, d)
        monkeypatch.setattr(bm, "HIER_MIN_CLUSTERS", 8)
        h_hier = mi(scene, o, d)
        np.testing.assert_array_equal(np.asarray(h_flat.prim_id),
                                      np.asarray(h_hier.prim_id))
        np.testing.assert_allclose(np.asarray(h_flat.t),
                                   np.asarray(h_hier.t), atol=1e-6)
