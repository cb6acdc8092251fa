"""Intersection-kernel tests against analytic cases."""

import numpy as np
import jax.numpy as jnp

from optix_ray_tracer_tpu.ops import intersect as isect
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles
from optix_ray_tracer_tpu.utils.vecmath import INF


def _scene(spheres=None, tris=None):
    return Scene(
        spheres=spheres if spheres is not None else Spheres.empty(),
        triangles=tris if tris is not None else Triangles.empty())


class TestSphere:
    def test_head_on_hit(self):
        s = _scene(spheres=Spheres.from_list([((0, 0, -5), 1.0, 0)]))
        o = jnp.asarray([[0.0, 0.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        hit = isect.intersect_scene_bruteforce(s, o, d)
        assert int(hit.prim_type[0]) == isect.PRIM_SPHERE
        np.testing.assert_allclose(float(hit.t[0]), 4.0, atol=1e-5)

    def test_miss(self):
        s = _scene(spheres=Spheres.from_list([((0, 0, -5), 1.0, 0)]))
        o = jnp.asarray([[0.0, 3.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        hit = isect.intersect_scene_bruteforce(s, o, d)
        assert int(hit.prim_type[0]) == isect.PRIM_NONE
        assert float(hit.t[0]) >= np.float32(INF)

    def test_inside_sphere_uses_far_root(self):
        s = _scene(spheres=Spheres.from_list([((0, 0, 0), 2.0, 0)]))
        o = jnp.asarray([[0.0, 0.0, 0.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        hit = isect.intersect_scene_bruteforce(s, o, d)
        np.testing.assert_allclose(float(hit.t[0]), 2.0, atol=1e-5)

    def test_nearest_of_many(self):
        s = _scene(spheres=Spheres.from_list(
            [((0, 0, -10), 1.0, 0), ((0, 0, -4), 1.0, 1), ((0, 0, -20), 1.0, 2)]))
        o = jnp.asarray([[0.0, 0.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        hit = isect.intersect_scene_bruteforce(s, o, d)
        assert int(hit.prim_id[0]) == 1
        np.testing.assert_allclose(float(hit.t[0]), 3.0, atol=1e-5)

    def test_normal_flip_inside(self):
        s = _scene(spheres=Spheres.from_list([((0, 0, 0), 2.0, 0)]))
        o = jnp.asarray([[0.0, 0.0, 0.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        hit = isect.intersect_scene_bruteforce(s, o, d)
        point, normal, front_face, mid = isect.shading_frame(s, o, d, hit)
        # inside: outward normal +x, flipped to -x; front_face False
        np.testing.assert_allclose(np.asarray(normal[0]), [-1, 0, 0], atol=1e-5)
        assert not bool(front_face[0])


class TestTriangle:
    TRI = np.asarray([[[0.0, -1.0, -1.0], [0.0, 1.0, -1.0], [0.0, 0.0, 1.0]]])

    def test_center_hit(self):
        tris = Triangles.from_arrays(self.TRI)
        s = _scene(tris=tris)
        o = jnp.asarray([[5.0, 0.0, 0.0]])
        d = jnp.asarray([[-1.0, 0.0, 0.0]])
        hit = isect.intersect_scene_bruteforce(s, o, d)
        assert int(hit.prim_type[0]) == isect.PRIM_TRIANGLE
        np.testing.assert_allclose(float(hit.t[0]), 5.0, atol=1e-5)

    def test_barycentrics(self):
        tris = Triangles.from_arrays(self.TRI)
        s = _scene(tris=tris)
        # aim exactly at vertex 1 (0, 1, -1): u=1
        o = jnp.asarray([[5.0, 0.999, -0.999]])
        d = jnp.asarray([[-1.0, 0.0, 0.0]])
        hit = isect.intersect_scene_bruteforce(s, o, d)
        assert float(hit.u[0]) > 0.99

    def test_edge_miss(self):
        tris = Triangles.from_arrays(self.TRI)
        s = _scene(tris=tris)
        o = jnp.asarray([[5.0, 1.5, 0.0]])
        d = jnp.asarray([[-1.0, 0.0, 0.0]])
        hit = isect.intersect_scene_bruteforce(s, o, d)
        assert int(hit.prim_type[0]) == isect.PRIM_NONE

    def test_backface_hit_and_flip(self):
        tris = Triangles.from_arrays(self.TRI)
        s = _scene(tris=tris)
        o = jnp.asarray([[-5.0, 0.0, 0.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        hit = isect.intersect_scene_bruteforce(s, o, d)
        assert int(hit.prim_type[0]) == isect.PRIM_TRIANGLE
        point, normal, front_face, _ = isect.shading_frame(s, o, d, hit)
        # shading normal must face the incoming ray
        assert float(jnp.sum(normal[0] * d[0])) < 0.0

    def test_interpolated_vertex_normals(self):
        normals = np.asarray([[[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]])
        tris = Triangles.from_arrays(self.TRI, normals)
        s = _scene(tris=tris)
        # hit near vertex 2 apex (0, 0, 1): w~0, u~0, v~1 -> normal ~ (0,0,1)
        o = jnp.asarray([[5.0, 0.0, 0.99]])
        d = jnp.asarray([[-1.0, 0.0, 0.0]])
        hit = isect.intersect_scene_bruteforce(s, o, d)
        _, normal, _, _ = isect.shading_frame(s, o, d, hit)
        n = np.asarray(normal[0])
        assert n[2] > 0.9

    def test_mixed_scene_nearest_type(self):
        tris = Triangles.from_arrays(self.TRI)  # plane at x=0
        sph = Spheres.from_list([((2.0, 0.0, 0.0), 0.5, 0)])
        s = _scene(spheres=sph, tris=tris)
        o = jnp.asarray([[5.0, 0.0, 0.0]])
        d = jnp.asarray([[-1.0, 0.0, 0.0]])
        hit = isect.intersect_scene_bruteforce(s, o, d)
        assert int(hit.prim_type[0]) == isect.PRIM_SPHERE
        np.testing.assert_allclose(float(hit.t[0]), 2.5, atol=1e-5)

    def test_chunking_consistency(self):
        # many triangles spanning several chunks must give the same result
        n = 1000
        centers = np.zeros((n, 3), np.float32)
        centers[:, 0] = -np.arange(n).astype(np.float32) - 1.0  # along -x
        tri = np.stack([centers + [0, -0.5, -0.5],
                        centers + [0, 0.5, -0.5],
                        centers + [0, 0.0, 0.5]], axis=1)
        tris = Triangles.from_arrays(tri)
        s = _scene(tris=tris)
        o = jnp.asarray([[5.0, 0.0, 0.0]])
        d = jnp.asarray([[-1.0, 0.0, 0.0]])
        h64 = isect.intersect_scene_bruteforce(s, o, d, chunk=64)
        h512 = isect.intersect_scene_bruteforce(s, o, d, chunk=512)
        assert int(h64.prim_id[0]) == int(h512.prim_id[0]) == 0
        np.testing.assert_allclose(float(h64.t[0]), float(h512.t[0]))


class TestAnyHit:
    def test_shadow_ray(self):
        s = _scene(spheres=Spheres.from_list([((0, 0, -5), 1.0, 0)]))
        o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        blocked = np.asarray(isect.intersect_any_bruteforce(s, o, d))
        assert blocked[0] and not blocked[1]
