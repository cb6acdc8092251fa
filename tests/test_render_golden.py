"""Golden tests: the JAX wavefront renderer vs an independent NumPy oracle.

The oracle re-implements the reference's Whitted protocol (payload depth
starting at 1, depth-5 cutoff to black, miss -> background, ROUGH/METAL
scatter — shader/Shader.cu:94-241) as a straightforward per-pixel NumPy
loop using the same counter-based RNG, so images must agree to float32
tolerance.  This substitutes for the golden fixtures the reference never had
(SURVEY.md section 4).
"""

import numpy as np
import jax.numpy as jnp

from optix_ray_tracer_tpu.ops import intersect as isect
from optix_ray_tracer_tpu.render import wavefront
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles
from optix_ray_tracer_tpu.scene.materials import MaterialBuilder

BG = np.asarray([0.7, 0.8, 0.9], np.float32)


# ---------------------------------------------------------------------------
# NumPy mirror of the counter-based RNG (must match utils/rng.py bit-exactly)
# ---------------------------------------------------------------------------

def np_pcg4d(a, b, c, d):
    with np.errstate(over="ignore"):
        x = np.uint32(a & 0xFFFFFFFF)
        y = np.uint32(b & 0xFFFFFFFF)
        z = np.uint32(c & 0xFFFFFFFF)
        w = np.uint32(d & 0xFFFFFFFF)
        mul, inc = np.uint32(1664525), np.uint32(1013904223)
        x = x * mul + inc
        y = y * mul + inc
        z = z * mul + inc
        w = w * mul + inc
        x = x + y * w
        y = y + z * x
        z = z + x * y
        w = w + y * z
        x ^= x >> np.uint32(16)
        y ^= y >> np.uint32(16)
        z ^= z >> np.uint32(16)
        w ^= w >> np.uint32(16)
        x = x + y * w
        y = y + z * x
        z = z + x * y
        w = w + y * z
    return x, y, z, w


def np_uniform4(pixel, sample, bounce, seed):
    out = np_pcg4d(pixel, sample, bounce, seed)
    return tuple(np.float32(v >> np.uint32(8)) * np.float32(1.0 / (1 << 24))
                 for v in out)


def np_unit_vector(pixel, sample, bounce, seed):
    u1, u2, _, _ = np_uniform4(pixel, sample, bounce, seed)
    z = np.float32(1.0) - np.float32(2.0) * u1
    r = np.sqrt(np.maximum(np.float32(0), np.float32(1) - z * z), dtype=np.float32)
    phi = np.float32(2.0 * 3.1415926) * u2
    return np.asarray([r * np.cos(phi), r * np.sin(phi), z], np.float32)


# ---------------------------------------------------------------------------
# NumPy oracle renderer (spheres only, ROUGH/METAL)
# ---------------------------------------------------------------------------

def oracle_render(centers, radii, mat_ids, mats, cam, width, height,
                  spp, seed, max_depth=5, t_min=1e-3):
    centers = np.asarray(centers, np.float32)
    radii = np.asarray(radii, np.float32)
    img = np.zeros((height, width, 3), np.float32)

    def nearest(o, d):
        oc = o - centers
        half_b = (oc * d).sum(-1)
        c = (oc * oc).sum(-1) - radii * radii
        disc = half_b * half_b - c
        t = np.full(len(centers), np.inf, np.float32)
        m = disc > 0
        sq = np.sqrt(np.maximum(disc, 0))
        t_near, t_far = -half_b - sq, -half_b + sq
        tt = np.where((t_near > t_min) & (t_near < 1e16), t_near,
                      np.where((t_far > t_min) & (t_far < 1e16), t_far, np.inf))
        t[m] = tt[m]
        i = int(np.argmin(t))
        return (i, float(t[i])) if np.isfinite(t[i]) else (None, None)

    U = np.asarray(cam.u, np.float32)
    V = np.asarray(cam.v, np.float32)
    W = np.asarray(cam.w, np.float32)
    C = np.asarray(cam.center, np.float32)
    aspect = np.float32(width / height)

    for iy in range(height):
        for ix in range(width):
            pid = iy * width + ix
            acc = np.zeros(3, np.float32)
            for s in range(spp):
                u1, u2, _, _ = np_uniform4(pid, s, 0xFFFFFFFF, seed)
                # stratified 4x4 subpixel grid (utils/rng.stratified_jitter)
                cell = s % 16
                u1 = np.float32((cell % 4 + u1) * 0.25)
                u2 = np.float32((cell // 4 + u2) * 0.25)
                ndc_x = np.float32(((ix + u1) / width) * 2 - 1)
                ndc_y = np.float32(1 - ((iy + u2) / height) * 2)
                d = ndc_x * aspect * U + ndc_y * V + W
                d = (d / np.linalg.norm(d)).astype(np.float32)
                o = C.copy()
                throughput = np.ones(3, np.float32)
                radiance = np.zeros(3, np.float32)
                for b in range(max_depth):
                    i, t = nearest(o, d)
                    if i is None:
                        radiance = throughput * BG
                        break
                    p = o + t * d
                    n = (p - centers[i]) / radii[i]
                    if (d * n).sum() >= 0:
                        n = -n
                    n_unit = n / np.linalg.norm(n)
                    mtype, albedo, fuzz = mats[mat_ids[i]]
                    if mtype == 0:  # ROUGH
                        rv = np_unit_vector(pid, s, b, seed ^ 0x1E3779B9)
                        nd = n_unit + rv
                        if (nd * nd).sum() < 1e-6:
                            nd = n_unit
                    else:  # METAL
                        refl = d - 2 * (d * n_unit).sum() * n_unit
                        refl = refl / np.linalg.norm(refl)
                        rv = np_unit_vector(pid, s, b, seed ^ 0x05EBCA6B)
                        nd = refl + np.float32(fuzz) * rv
                    nd = nd / np.linalg.norm(nd)
                    throughput = throughput * np.asarray(albedo, np.float32)
                    o, d = p.astype(np.float32), nd.astype(np.float32)
                acc += radiance
            img[iy, ix] = acc / spp
    return img


def _test_scene():
    mb = MaterialBuilder()
    ground = mb.add_rough((0.70, 0.60, 0.50))
    red = mb.add_rough((0.65, 0.05, 0.05))
    metal = mb.add_metal((0.8, 0.85, 0.88), 0.1)
    mats = mb.build()
    spheres = [((0.0, 0.0, -100.5), 100.0, ground),
               ((0.0, 0.0, 0.0), 0.5, red),
               ((0.0, 1.2, 0.3), 0.5, metal)]
    scene = Scene(spheres=Spheres.from_list(spheres), triangles=Triangles.empty())
    cam = Camera.look_at((5.0, 0.0, 0.5), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    oracle_mats = [(0, (0.70, 0.60, 0.50), 0.0),
                   (0, (0.65, 0.05, 0.05), 0.0),
                   (1, (0.8, 0.85, 0.88), 0.1)]
    return scene, mats, cam, spheres, oracle_mats


class TestGolden:
    def test_matches_numpy_oracle(self):
        scene, mats, cam, spheres, omats = _test_scene()
        W, H, SPP, SEED = 24, 16, 2, 11

        img, _, _ = wavefront.render(scene, mats, cam, W, H, spp=SPP,
                                     seed=SEED, background=tuple(BG))
        img = np.asarray(img)

        centers = [s[0] for s in spheres]
        radii = [s[1] for s in spheres]
        mids = [s[2] for s in spheres]
        ref = oracle_render(centers, radii, mids, omats, cam, W, H, SPP, SEED)

        # float32 op-ordering differences only; RNG streams are bit-identical
        np.testing.assert_allclose(img, ref, atol=5e-3)

    def test_deterministic(self):
        scene, mats, cam, _, _ = _test_scene()
        a, _, _ = wavefront.render(scene, mats, cam, 32, 24, spp=2, seed=3)
        b, _, _ = wavefront.render(scene, mats, cam, 32, 24, spp=2, seed=3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_seed_changes_noise(self):
        scene, mats, cam, _, _ = _test_scene()
        a, _, _ = wavefront.render(scene, mats, cam, 32, 24, spp=1, seed=3)
        b, _, _ = wavefront.render(scene, mats, cam, 32, 24, spp=1, seed=4)
        assert not np.array_equal(np.asarray(a), np.asarray(b))

    def test_empty_scene_is_background(self):
        mats = MaterialBuilder().build()
        scene = Scene(spheres=Spheres.empty(), triangles=Triangles.empty())
        cam = Camera.look_at((0, 0, 0), (1, 0, 0), (0, 0, 1))
        img, _, _ = wavefront.render(scene, mats, cam, 8, 8, spp=1, seed=0,
                                     background=tuple(BG))
        np.testing.assert_allclose(np.asarray(img),
                                   np.broadcast_to(BG, (8, 8, 3)), atol=1e-6)

    def test_guide_buffers(self):
        scene, mats, cam, _, _ = _test_scene()
        img, albedo, normal = wavefront.render(scene, mats, cam, 32, 24,
                                               spp=1, seed=0, jitter=False)
        albedo = np.asarray(albedo)
        normal = np.asarray(normal)
        # center of frame looks at the red sphere
        assert albedo[12, 16, 0] > 0.5 and albedo[12, 16, 1] < 0.2
        # its first-hit normal roughly faces the camera (+x)
        assert normal[12, 16, 0] > 0.7

    def test_depth_exhaustion_is_black(self):
        # two parallel mirrors: rays bounce forever -> depth cutoff -> black
        mb = MaterialBuilder()
        m = mb.add_metal((1.0, 1.0, 1.0), 0.0)
        mats = mb.build()
        tri1 = np.asarray([[[0, -10, -10], [0, 10, -10], [0, 0, 10]]], np.float32)
        tri2 = tri1.copy()
        tri2[..., 0] = 1.0
        tris = Triangles.from_arrays(np.concatenate([tri1, tri2]), material_id=m)
        scene = Scene(spheres=Spheres.empty(), triangles=tris)
        cam = Camera.look_at((0.5, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 0.0, 1.0))
        img, _, _ = wavefront.render(scene, mats, cam, 8, 8, spp=1, seed=0,
                                     max_depth=5, jitter=False)
        np.testing.assert_allclose(np.asarray(img)[4, 4], [0, 0, 0], atol=1e-6)
