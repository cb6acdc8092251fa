"""Tile-raster engine (ops/raster.py + ops/pallas/tile_raster.py):
exactness vs the brute-force oracle for all three projection modes,
conservatism edge cases, the overflow contract, and the intersect_from
product wiring (including the exact marcher fallback)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optix_ray_tracer_tpu.io.meshgen import sphere_with_n_triangles
from optix_ray_tracer_tpu.ops.intersect import intersect_scene_bruteforce
from optix_ray_tracer_tpu.ops.march import (
    attach_raster, make_march_intersector,
)
from optix_ray_tracer_tpu.ops.raster import build_raster_set, raster_query
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles


@pytest.fixture(scope="module")
def setup():
    v, n = sphere_with_n_triangles(1000)
    scene = Scene(spheres=Spheres.empty(),
                  triangles=Triangles.from_arrays(v, n))
    inter = make_march_intersector(scene, raster=True)
    cam = Camera.look_at((3.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    o, d = cam.generate_rays(48, 48)
    return scene, inter, o.reshape(-1, 3), d.reshape(-1, 3)


def _prims(inter, slot):
    prim = np.asarray(inter.clusters.prim_index)[np.maximum(np.asarray(slot), 0)]
    return np.where(np.asarray(slot) < 0, -1, prim)


def _oracle_prims(hit):
    return np.where(np.asarray(hit.t) < 1e15, np.asarray(hit.prim_id), -1)


def test_origin_mode_exact_vs_oracle(setup):
    scene, inter, o, d = setup
    t, slot, u, v, ok = raster_query(inter.raster, inter.clusters, o, d,
                                     1e-3, 1e16, mode="origin", point=o[0],
                                     block_rays=128)
    assert bool(ok)
    hit = intersect_scene_bruteforce(scene, o, d, t_min=1e-3)
    assert (_prims(inter, slot) == _oracle_prims(hit)).all()
    m = _oracle_prims(hit) >= 0
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(hit.t)[m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(hit.u)[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v)[m], np.asarray(hit.v)[m],
                               rtol=1e-4, atol=1e-5)


def test_origin_inside_geometry(setup):
    """Camera inside the sphere: every triangle behind the projection
    plane must still be found via the full-plane path."""
    scene, inter, _, _ = setup
    cam = Camera.look_at((0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    o, d = cam.generate_rays(24, 24)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    t, slot, _, _, ok = raster_query(inter.raster, inter.clusters, o, d,
                                     1e-3, 1e16, mode="origin", point=o[0],
                                     block_rays=128)
    assert bool(ok)
    hit = intersect_scene_bruteforce(scene, o, d, t_min=1e-3)
    assert (_prims(inter, slot) == _oracle_prims(hit)).all()
    assert (_prims(inter, slot) >= 0).all()   # inside: every ray hits


def test_target_mode_shadow_wave(setup):
    """Point-light shadow rays: binning from the common TARGET, forward
    segment test — any-hit and nearest both match the oracle."""
    scene, inter, o, d = setup
    hit = intersect_scene_bruteforce(scene, o, d, t_min=1e-3)
    light = jnp.asarray([3.0, 3.0, 3.0], jnp.float32)
    is_hit = np.asarray(hit.t) < 1e15
    point = jnp.where(jnp.asarray(is_hit)[:, None],
                      o + jnp.asarray(hit.t)[:, None] * d, o)
    to_l = light - point
    dist = jnp.linalg.norm(to_l, axis=-1, keepdims=True)
    wl = to_l / jnp.maximum(dist, 1e-6)
    so = point + wl * 1e-3
    t_max = dist[:, 0] - 1e-3
    _, slot, _, _, ok = raster_query(inter.raster, inter.clusters, so, wl,
                                     1e-4, t_max, mode="target",
                                     point=light, any_hit=True,
                                     block_rays=128)
    assert bool(ok)
    occ = np.asarray(slot) >= 0
    occ_o = np.asarray(inter.any_hit(scene, so, wl, t_min=1e-4, t_max=t_max))
    assert (occ == occ_o).all()
    # nearest-hit variant
    _, slot2, _, _, ok2 = raster_query(inter.raster, inter.clusters, so,
                                       wl, 1e-4, t_max, mode="target",
                                       point=light, block_rays=128)
    assert bool(ok2)
    h2 = intersect_scene_bruteforce(scene, so, wl, t_min=1e-4, t_max=t_max)
    assert (_prims(inter, slot2) == _oracle_prims(h2)).all()


def test_ortho_mode_sun_shadow(setup):
    scene, inter, o, d = setup
    hit = intersect_scene_bruteforce(scene, o, d, t_min=1e-3)
    point = jnp.where((jnp.asarray(hit.t) < 1e15)[:, None],
                      o + jnp.asarray(hit.t)[:, None] * d, o)
    sun = jnp.asarray([0.3, 0.2, 0.9], jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    so = point + sun * 1e-3
    dd = jnp.broadcast_to(sun, so.shape)
    _, slot, _, _, ok = raster_query(inter.raster, inter.clusters, so, dd,
                                     1e-4, 1e16, mode="ortho",
                                     any_hit=True, block_rays=128)
    assert bool(ok)
    occ = np.asarray(slot) >= 0
    occ_o = np.asarray(inter.any_hit(scene, so, dd, t_min=1e-4))
    assert (occ == occ_o).all()


def test_dead_rays_and_per_ray_t_max(setup):
    """Rays with empty (t_min, t_max) never hit; tight per-ray t_max
    rejects hits beyond it, exactly like the marcher."""
    scene, inter, o, d = setup
    hit = intersect_scene_bruteforce(scene, o, d, t_min=1e-3)
    t_o = np.asarray(hit.t)
    med = float(np.median(t_o[t_o < 1e15]))
    t_max = jnp.full(o.shape[0], med, jnp.float32)
    t_max = t_max.at[::7].set(0.0)              # dead rays
    t, slot, _, _, ok = raster_query(inter.raster, inter.clusters, o, d,
                                     1e-3, t_max, mode="origin",
                                     point=o[0], block_rays=128)
    assert bool(ok)
    h2 = intersect_scene_bruteforce(scene, o, d, t_min=1e-3, t_max=t_max)
    assert (_prims(inter, slot) == _oracle_prims(h2)).all()
    assert (np.asarray(slot)[::7] == -1).all()


def test_overflow_flag_on_tiny_caps(setup):
    scene, inter, o, d = setup
    _, _, _, _, ok = raster_query(inter.raster, inter.clusters, o, d,
                                  1e-3, 1e16, mode="origin", point=o[0],
                                  block_rays=128, pc_max=32)
    assert not bool(ok)


def test_intersect_from_matches_intersect(setup):
    """The product wrapper returns the same Hit as the sorted marcher
    path, and the overflow fallback keeps it EXACT at absurd caps."""
    scene, inter, o, d = setup
    h_m = inter.intersect(scene, o, d)
    h_r = jax.jit(lambda o, d: inter.intersect_from(
        scene, o, d, mode="origin", point=o[0], block_rays=128))(o, d)
    assert (np.asarray(h_r.prim_id) == np.asarray(h_m.prim_id)).all()
    assert (np.asarray(h_r.prim_type) == np.asarray(h_m.prim_type)).all()
    np.testing.assert_allclose(np.asarray(h_r.t), np.asarray(h_m.t),
                               rtol=1e-6, atol=0)
    # overflow => lax.cond falls back to the marcher: still exact
    h_f = inter.intersect_from(scene, o, d, mode="origin", point=o[0],
                               block_rays=128, pc_max=32)
    assert (np.asarray(h_f.prim_id) == np.asarray(h_m.prim_id)).all()
    np.testing.assert_allclose(np.asarray(h_f.t), np.asarray(h_m.t),
                               rtol=1e-6, atol=0)


def test_any_hit_from_and_sphere_merge():
    """intersect_from merges analytic spheres like the marcher path."""
    v, nn = sphere_with_n_triangles(500)
    scene = Scene(
        spheres=Spheres.from_list([((0.0, 0.0, -100.6), 100.0, 0)]),
        triangles=Triangles.from_arrays(v, nn))
    inter = make_march_intersector(scene, raster=True)
    cam = Camera.look_at((3.0, 0.0, 0.4), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    o, d = cam.generate_rays(32, 32)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    h_m = inter.intersect(scene, o, d)
    h_r = inter.intersect_from(scene, o, d, mode="origin", point=o[0],
                               block_rays=128)
    assert (np.asarray(h_r.prim_type) == np.asarray(h_m.prim_type)).all()
    assert (np.asarray(h_r.prim_id) == np.asarray(h_m.prim_id)).all()
    light = jnp.asarray([2.0, 2.0, 3.0], jnp.float32)
    pt = jnp.where((np.asarray(h_m.t) < 1e15)[:, None],
                   o + jnp.asarray(np.asarray(h_m.t))[:, None] * d, o)
    tl = light - pt
    dist = jnp.linalg.norm(tl, axis=-1, keepdims=True)
    wl = tl / jnp.maximum(dist, 1e-6)
    so = pt + wl * 1e-3
    occ_r = inter.any_hit_from(scene, so, wl, mode="target", point=light,
                               t_max=dist[:, 0], block_rays=128)
    occ_m = inter.any_hit(scene, so, wl, t_max=dist[:, 0])
    assert (np.asarray(occ_r) == np.asarray(occ_m)).all()


def test_refit_rebuild_keeps_raster(setup):
    """rebuild/refit regenerate the raster tables (animation path)."""
    from optix_ray_tracer_tpu.ops.march import rebuild_march_intersector

    scene, inter, o, d = setup
    shifted = Scene(
        spheres=Spheres.empty(),
        triangles=Triangles.from_arrays(
            scene.triangles.vertices + jnp.asarray([0.2, 0.0, 0.1]),
            scene.triangles.normals))
    inter2 = rebuild_march_intersector(inter, shifted)
    assert inter2.raster is not None
    t, slot, _, _, ok = raster_query(inter2.raster, inter2.clusters, o, d,
                                     1e-3, 1e16, mode="origin", point=o[0],
                                     block_rays=128)
    assert bool(ok)
    hit = intersect_scene_bruteforce(shifted, o, d, t_min=1e-3)
    assert (_prims(inter2, slot) == _oracle_prims(hit)).all()


def test_integrators_match_with_raster_camera_wave():
    """Attaching raster tables routes the camera wave through the tile
    raster engine.  Primary t/prim are BIT-exact (asserted in
    test_intersect_from_matches_intersect); the winner u/v are carried
    in-kernel and agree with the marcher's post-hoc einsum only to fp
    accumulation order (~3e-6), so interpolated shading normals — and
    through them the images — match to fp noise, not bitwise."""
    from optix_ray_tracer_tpu.render import wavefront
    from optix_ray_tracer_tpu.scene.materials import MaterialBuilder

    v, nn = sphere_with_n_triangles(600)
    mb = MaterialBuilder()
    ground = mb.add_rough((0.7, 0.6, 0.5))
    red = mb.add_rough((0.65, 0.05, 0.05))
    scene = Scene(
        spheres=Spheres.from_list([((0.0, 0.0, -100.55), 100.0, ground)]),
        triangles=Triangles.from_arrays(v, nn, red))
    mats = mb.build()
    cam = Camera.look_at((3.0, 0.0, 0.3), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    plain = make_march_intersector(scene)
    withr = attach_raster(plain, scene)
    img_a, alb_a, _ = wavefront.render(scene, mats, cam, 64, 64, spp=2,
                                       seed=3, intersector=plain)
    img_b, alb_b, _ = wavefront.render(scene, mats, cam, 64, 64, spp=2,
                                       seed=3, intersector=withr)

    def _close(a, b):
        diff = np.abs(np.asarray(a) - np.asarray(b))
        assert diff.mean() < 1e-5 and diff.max() < 0.05, \
            (diff.mean(), diff.max())

    _close(img_a, img_b)
    _close(alb_a, alb_b)

    from optix_ray_tracer_tpu.render import pathtracer
    from optix_ray_tracer_tpu.scene.lights import collect_area_lights
    em = mb.add_emissive((4.0, 4.0, 4.0))
    quad = np.asarray([[[-0.5, -0.5, 1.2], [0.5, -0.5, 1.2],
                        [0.5, 0.5, 1.2]],
                       [[-0.5, -0.5, 1.2], [0.5, 0.5, 1.2],
                        [-0.5, 0.5, 1.2]]], np.float32)
    tv = np.concatenate([np.asarray(v), quad], 0)
    tn = np.concatenate(
        [np.asarray(nn),
         np.tile(np.asarray([0, 0, -1], np.float32), (2, 3, 1))], 0)
    tm = np.concatenate([np.full(len(v), red, np.int32),
                         np.full(2, em, np.int32)])
    scene2 = Scene(spheres=Spheres.empty(),
                   triangles=Triangles.from_arrays(tv, tn, tm))
    mats2 = mb.build()
    lights = collect_area_lights(scene2, mats2)
    p2 = make_march_intersector(scene2)
    r2 = attach_raster(p2, scene2)
    ia = pathtracer.render_path(scene2, mats2, lights, cam, 64, 64, spp=2,
                                seed=5, max_depth=3, intersector=p2)[0]
    ib = pathtracer.render_path(scene2, mats2, lights, cam, 64, 64, spp=2,
                                seed=5, max_depth=3, intersector=r2)[0]
    _close(ia, ib)


class TestBundleEngine:
    """3-D bundle binning for arbitrary-ray (bounce/NEE) waves
    (ops/raster.py bundle_query + MarchIntersector.intersect_bundled)."""

    def _bounce_wave(self, scene, o, d, seed=5):
        """Diffuse bounce rays from the primary hits, tile-coherent
        origins, hemispherical directions; misses become dead lanes."""
        hit = intersect_scene_bruteforce(scene, o, d, t_min=1e-3)
        t = np.asarray(hit.t)
        live = t < 1e15
        p = np.asarray(o) + t[:, None] * np.asarray(d)
        rng = np.random.default_rng(seed)
        nd = rng.normal(size=p.shape).astype(np.float32)
        nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
        ob = np.where(live[:, None], p, 0.0).astype(np.float32)
        t_max = np.where(live, 1e16, 0.0).astype(np.float32)
        return jnp.asarray(ob), jnp.asarray(nd), jnp.asarray(t_max)

    def test_bundle_exact_vs_oracle(self, setup):
        from optix_ray_tracer_tpu.ops.raster import bundle_query
        scene, inter, o, d = setup
        ob, db, t_max = self._bounce_wave(scene, o, d)
        t, slot, u, v, ok = bundle_query(inter.clusters, ob, db,
                                         jnp.full(ob.shape[0], 1e-3),
                                         t_max, block_rays=128)
        assert bool(ok)
        h2 = intersect_scene_bruteforce(scene, ob, db, t_min=1e-3,
                                        t_max=t_max)
        assert (_prims(inter, slot) == _oracle_prims(h2)).all()
        m = _oracle_prims(h2) >= 0
        # bounce origins sit ON surfaces, so grazing re-hits are
        # ill-conditioned: Woop vs the oracle's Moller-Trumbore differ
        # up to ~2e-4 relative on a couple of rays (same prim); the
        # BIT-level check is vs the marcher (same Woop arithmetic) in
        # test_intersect_bundled_matches_marcher
        np.testing.assert_allclose(np.asarray(t)[m], np.asarray(h2.t)[m],
                                   rtol=5e-4, atol=1e-5)

    @pytest.mark.parametrize("g,octants", [(2, True), (4, True),
                                           (4, False)])
    def test_bundle_granularity_exact(self, setup, g, octants):
        """Sub-cluster windows + octant direction refinement change the
        schedule only — the hit set is the oracle's (VERDICT r4 #5)."""
        from optix_ray_tracer_tpu.ops.raster import bundle_query
        scene, inter, o, d = setup
        ob, db, t_max = self._bounce_wave(scene, o, d, seed=7)
        t, slot, u, v, ok = bundle_query(inter.clusters, ob, db,
                                         jnp.full(ob.shape[0], 1e-3),
                                         t_max, block_rays=128,
                                         granularity=g,
                                         dir_octants=octants)
        assert bool(ok)
        h2 = intersect_scene_bruteforce(scene, ob, db, t_min=1e-3,
                                        t_max=t_max)
        assert (_prims(inter, slot) == _oracle_prims(h2)).all()

    def test_bundle_any_hit(self, setup):
        from optix_ray_tracer_tpu.ops.raster import bundle_query
        scene, inter, o, d = setup
        ob, db, t_max = self._bounce_wave(scene, o, d, seed=9)
        # NEE-style finite segments: half the median hit distance
        h2 = intersect_scene_bruteforce(scene, ob, db, t_min=1e-3,
                                        t_max=t_max)
        t_o = np.asarray(h2.t)
        seg = np.where(np.asarray(t_max) > 0.0,
                       float(np.median(t_o[t_o < 1e15])) * 1.5,
                       0.0).astype(np.float32)
        _, slot, _, _, ok = bundle_query(inter.clusters, ob, db,
                                         jnp.full(ob.shape[0], 1e-3),
                                         jnp.asarray(seg), any_hit=True,
                                         block_rays=128)
        assert bool(ok)
        h3 = intersect_scene_bruteforce(scene, ob, db, t_min=1e-3,
                                        t_max=jnp.asarray(seg))
        np.testing.assert_array_equal(np.asarray(slot) >= 0,
                                      _oracle_prims(h3) >= 0)

    def test_intersect_bundled_matches_marcher(self, setup):
        scene, inter, o, d = setup
        ob, db, t_max = self._bounce_wave(scene, o, d, seed=11)
        h_m = inter.for_incoherent().intersect(scene, ob, db,
                                               t_max=t_max)
        h_b = jax.jit(lambda a, b, tm: inter.intersect_bundled(
            scene, a, b, t_max=tm, block_rays=128))(ob, db, t_max)
        assert (np.asarray(h_b.prim_id) == np.asarray(h_m.prim_id)).all()
        np.testing.assert_allclose(np.asarray(h_b.t), np.asarray(h_m.t),
                                   rtol=1e-6, atol=0)
        # overflow => exact marcher fallback
        h_f = inter.intersect_bundled(scene, ob, db, t_max=t_max,
                                      block_rays=128, pc_max=32)
        assert (np.asarray(h_f.prim_id) == np.asarray(h_m.prim_id)).all()

    def test_bundle_all_dead_wave(self, setup):
        from optix_ray_tracer_tpu.ops.raster import bundle_query
        scene, inter, o, d = setup
        z = jnp.zeros(o.shape[0], jnp.float32)
        t, slot, _, _, ok = bundle_query(inter.clusters, o, d,
                                         jnp.full(o.shape[0], 1e-3), z,
                                         block_rays=128)
        assert bool(ok)
        assert (np.asarray(slot) == -1).all()

    def test_short_first_exact(self, setup):
        """Two-pass short-ray-first (capped bundle + marcher tail)
        equals the single-pass marcher, at several cap radii including
        degenerate ones."""
        scene, inter, o, d = setup
        ob, db, t_max = self._bounce_wave(scene, o, d, seed=13)
        h_m = inter.for_incoherent().intersect(scene, ob, db, t_max=t_max)
        for r in (0.05, 0.4, 5.0):
            h_s = inter.intersect_short_first(scene, ob, db, t_max=t_max,
                                              radius=r, block_rays=128)
            assert (np.asarray(h_s.prim_id)
                    == np.asarray(h_m.prim_id)).all(), r
            np.testing.assert_allclose(np.asarray(h_s.t),
                                       np.asarray(h_m.t),
                                       rtol=1e-6, atol=0, err_msg=str(r))

    def test_build_sets_bounce_radius(self, setup):
        scene, inter, _, _ = setup
        assert inter.bounce_radius > 0.0
        from optix_ray_tracer_tpu.ops.march import (
            refit_march_intersector,
        )
        assert refit_march_intersector(inter, scene).bounce_radius \
            == inter.bounce_radius
