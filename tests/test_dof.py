"""Thin-lens depth of field (Camera.aperture / focus_dist extension).

The reference camera is pinhole-only (shader/Shader.cu:249-261); DOF is
an extension.  Contract under test: aperture == 0 is BIT-exact with the
pre-DOF pinhole rays (a select, not an epsilon), objects on the focus
plane stay sharp, objects off it blur.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from optix_ray_tracer_tpu.models import common
from optix_ray_tracer_tpu.render import wavefront
from optix_ray_tracer_tpu.scene.camera import Camera, FlyCameraController
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles
from optix_ray_tracer_tpu.scene.materials import MaterialBuilder


def _scene_one_sphere(x: float):
    mb = MaterialBuilder()
    white = mb.add_rough((0.95, 0.95, 0.95))
    scene = Scene(spheres=Spheres.from_list([((x, 0.0, 0.0), 0.25, white)]),
                  triangles=Triangles.empty())
    return scene, mb.build()


class TestLensMath:
    def test_aperture_zero_bit_exact(self):
        cam_pin = Camera.look_at((5, 0, 0.5), (0, 0, 0), (0, 0, 1))
        o0, d0 = cam_pin.generate_rays(32, 24)
        lens = jnp.full((24, 32, 2), 0.37, jnp.float32)
        o1, d1 = cam_pin.generate_rays(32, 24, lens_uv=lens)
        np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    def test_focus_plane_rays_converge(self):
        # all lens samples aim exactly at the same focus-plane point
        cam = Camera.look_at((4, 0, 0), (0, 0, 0), (0, 0, 1),
                             aperture=0.2, focus_dist=4.0)
        lens_a = jnp.asarray([[[0.9, 0.0]]], jnp.float32)
        lens_b = jnp.asarray([[[-0.9, 0.4]]], jnp.float32)
        o0, d0 = cam.generate_rays(1, 1)                     # chief ray
        oa, da = cam.generate_rays(1, 1, lens_uv=lens_a)
        ob, db = cam.generate_rays(1, 1, lens_uv=lens_b)
        w_unit = np.asarray(cam.w) / np.linalg.norm(np.asarray(cam.w))

        def focus_point(o, d):
            o, d = np.asarray(o)[0, 0], np.asarray(d)[0, 0]
            t = 4.0 / float(np.dot(d, w_unit))
            return o + t * d

        p0, pa, pb = (focus_point(o0, d0), focus_point(oa, da),
                      focus_point(ob, db))
        np.testing.assert_allclose(pa, p0, atol=1e-5)
        np.testing.assert_allclose(pb, p0, atol=1e-5)

    def test_controller_preserves_lens(self):
        cam = Camera.look_at((4, 0, 0), (0, 0, 0), (0, 0, 1),
                             aperture=0.1, focus_dist=3.0)
        ctl = FlyCameraController(cam)
        cam2 = ctl.update(mouse_dx=10, forward=True)
        assert float(cam2.aperture) == pytest.approx(0.1)
        assert float(cam2.focus_dist) == pytest.approx(3.0)


class TestRenderedBlur:
    def _render(self, scene, mats, cam, spp=16):
        img, _, _ = wavefront.render(
            scene, mats, cam, 48, 32, spp=spp, seed=5,
            background=(0.7, 0.8, 0.9), max_depth=2,
            intersector=common.choose_intersector(scene))
        return np.asarray(img)

    @pytest.mark.slow
    def test_in_focus_sharp_out_of_focus_blurred(self):
        scene, mats = _scene_one_sphere(0.0)
        center = (5.0, 0.0, 0.0)
        pin = Camera.look_at(center, (0, 0, 0), (0, 0, 1))
        focused = Camera.look_at(center, (0, 0, 0), (0, 0, 1),
                                 aperture=0.25, focus_dist=5.0)
        defocus = Camera.look_at(center, (0, 0, 0), (0, 0, 1),
                                 aperture=0.25, focus_dist=2.0)
        ref = self._render(scene, mats, pin)
        img_f = self._render(scene, mats, focused)
        img_d = self._render(scene, mats, defocus)
        sky = np.asarray([0.7, 0.8, 0.9])

        def spread(img):
            """RMS radius of the sphere's (sky-subtracted) footprint —
            grows when defocus blur smears the silhouette."""
            wgt = np.abs(img - sky).sum(-1)
            yy, xx = np.mgrid[0:img.shape[0], 0:img.shape[1]]
            m = wgt.sum()
            cy, cx = (wgt * yy).sum() / m, (wgt * xx).sum() / m
            return float(np.sqrt((wgt * ((yy - cy) ** 2 +
                                         (xx - cx) ** 2)).sum() / m))

        # focused at the sphere: same image as pinhole (blur circle is
        # far below a pixel at this geometry); defocused: the footprint's
        # RMS radius grows measurably
        np.testing.assert_allclose(img_f, ref, atol=5e-3)
        assert spread(img_d) > 1.25 * spread(ref), \
            (spread(ref), spread(img_d))
        assert np.abs(img_d - ref).mean() > 1e-4

    def test_config_keys(self):
        from optix_ray_tracer_tpu.io.config import parse_config_dict

        cfg = parse_config_dict({"loop-data": {
            "api": "HEADLESS", "aperture": 0.3, "focus-distance": 2.5}})
        cam = common.camera_from_config(cfg)
        assert float(cam.aperture) == pytest.approx(0.3)
        assert float(cam.focus_dist) == pytest.approx(2.5)
        # defaults: pinhole
        cam0 = common.camera_from_config(parse_config_dict({}))
        assert float(cam0.aperture) == 0.0
