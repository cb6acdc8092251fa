"""ReSTIR DI (render/restir.py): unbiasedness vs an independent NEE
estimator, equal-shadow-ray-budget RMSE win, temporal convergence, and
deterministic replay."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optix_ray_tracer_tpu.render import restir
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles
from optix_ray_tracer_tpu.scene.lights import collect_area_lights, sample_lights
from optix_ray_tracer_tpu.scene.materials import EMISSIVE, MaterialBuilder

W, H = 32, 24


def _quad(cx, cy, z, half, flip=False):
    """Two triangles of an axis-aligned quad at height z."""
    a = [cx - half, cy - half, z]
    b = [cx + half, cy - half, z]
    c = [cx + half, cy + half, z]
    d = [cx - half, cy + half, z]
    t1 = [a, b, c] if not flip else [a, c, b]
    t2 = [a, c, d] if not flip else [a, d, c]
    return [t1, t2]


def _scene():
    """Floor plane + 16 small emissive panels of very unequal power (one
    panel carries ~85% of the flux) + one occluder strip — the many-light,
    high-variance regime ReSTIR exists for."""
    mb = MaterialBuilder()
    floor_m = mb.add_rough((0.7, 0.7, 0.7))
    verts, mats = [], []
    verts += _quad(0.0, 0.0, 0.0, 4.0)
    mats += [floor_m, floor_m]
    rs = np.random.RandomState(7)
    for i in range(16):
        x = -3.0 + 2.0 * (i % 4)
        y = -3.0 + 2.0 * (i // 4)
        power = 400.0 if i == 5 else float(rs.uniform(0.5, 4.0))
        m = mb.add_emissive((power, 0.9 * power, 0.7 * power))
        verts += _quad(x, y, 2.0, 0.18)
        mats += [m, m]
    # occluder strip shadowing part of the floor
    occ_m = mb.add_rough((0.2, 0.2, 0.2))
    verts += _quad(1.0, -1.0, 1.0, 0.5)
    mats += [occ_m, occ_m]
    v = np.asarray(verts, np.float32)
    n = np.zeros_like(v)
    n[:, :, 2] = 1.0
    tris = Triangles.from_arrays(v, n, np.asarray(mats, np.int32))
    scene = Scene(spheres=Spheres.empty(), triangles=tris)
    materials = mb.build()
    lights = collect_area_lights(scene, materials)
    # |w| = 1 -> ~45 deg half-angle; the floor fills most of the frame
    cam = Camera.look_at((0.0, 0.0, 7.0), (0.0, 0.0, 6.0), (0.0, 1.0, 0.0))
    return scene, materials, lights, cam


def _gbuffer(scene, materials, cam):
    from optix_ray_tracer_tpu.ops import intersect as isect
    from optix_ray_tracer_tpu.ops.traverse import BruteForceIntersector
    from optix_ray_tracer_tpu.scene.materials import ROUGH
    from optix_ray_tracer_tpu.utils.vecmath import INF, normalize

    bf = BruteForceIntersector()
    o, d = cam.generate_rays(W, H)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    hit = bf.intersect(scene, o, d, t_max=jnp.full((W * H,), INF))
    point, normal, _, mid = isect.shading_frame(scene, o, d, hit)
    n_unit = normalize(normal)
    mtype, albedo, _, emission = materials.gather(mid)
    active = hit.is_hit & (mtype == ROUGH)
    base = jnp.where(~hit.is_hit[..., None], 0.0,
                     jnp.where((mtype == EMISSIVE)[..., None], emission,
                               0.0))
    return bf, point, n_unit, albedo, active, base


def nee_direct(scene, materials, lights, cam, spp, seed):
    """Independent plain power-weighted NEE direct estimator (1 shadow ray
    per sample), written against the library primitives but with its own
    estimator math — the mean/equal-budget baseline for ReSTIR."""
    from optix_ray_tracer_tpu.utils.vecmath import PI, dot

    bf, point, n_unit, albedo, active, base = _gbuffer(scene, materials,
                                                       cam)
    pid = jnp.arange(W * H, dtype=jnp.int32)

    def body(acc, s):
        wl, dist, pdf, emitted, _ = sample_lights(lights, point, pid, s, 0,
                                                  seed)
        cos_s = jnp.maximum(dot(wl, n_unit), 0.0)
        valid = active & (cos_s > 0.0) & (pdf > 0.0)
        occ = bf.any_hit(scene, point + n_unit * 1e-3, wl, t_min=1e-4,
                         t_max=jnp.where(valid, dist - 2e-3, 0.0))
        c = (albedo / PI) * emitted * (cos_s / jnp.maximum(pdf, 1e-12)
                                       )[..., None]
        return acc + jnp.where((valid & ~occ)[..., None], c, 0.0), None

    acc, _ = jax.lax.scan(jax.jit(body), jnp.zeros((W * H, 3)),
                          jnp.arange(spp, dtype=jnp.int32))
    return np.asarray((base + acc / spp).reshape(H, W, 3))


@pytest.fixture(scope="module")
def setup():
    scene, materials, lights, cam = _scene()
    truth = nee_direct(scene, materials, lights, cam, 1500, seed=99)
    return scene, materials, lights, cam, truth


def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def test_restir_unbiased_no_reuse(setup):
    """Candidate RIS + visibility ray is an unbiased NEE estimator: the
    mean over independent frames matches the independent NEE truth."""
    scene, materials, lights, cam, truth = setup
    acc = np.zeros((H, W, 3), np.float32)
    n = 48
    for f in range(n):
        img, _, _, _ = restir.render_restir(
            scene, materials, lights, cam, W, H, seed=1000 + f,
            m_candidates=8, spatial_taps=0)
        acc += np.asarray(img)
    mean = acc / n
    scale = float(truth.mean())
    assert abs(float(mean.mean()) - scale) / scale < 0.03
    # pixelwise agreement within MC noise of the 48-frame mean
    assert _rmse(mean, truth) / scale < 0.25


def test_restir_equal_budget_beats_nee(setup):
    """One ReSTIR frame (1 shadow ray/pixel) vs one 1-spp NEE frame: the
    resampled frame must be at least 2x lower RMSE (measured ~3-6x)."""
    scene, materials, lights, cam, truth = setup
    nee_1spp = nee_direct(scene, materials, lights, cam, 1, seed=5)
    img, _, _, _ = restir.render_restir(
        scene, materials, lights, cam, W, H, seed=5,
        m_candidates=16, spatial_taps=2)
    r_nee = _rmse(nee_1spp, truth)
    r_restir = _rmse(img, truth)
    assert r_restir < r_nee / 2.0, (r_restir, r_nee)


def test_restir_temporal_converges(setup):
    """Temporal reservoir reuse: RMSE after 8 frames of history is well
    below the first frame's; the state dict round-trips through frames
    (scan-carry shape/dtype stability) with bounded m."""
    scene, materials, lights, cam, truth = setup
    state = restir.empty_reservoir_state(W, H)
    first = last = None
    shapes = {k: (v.shape, v.dtype) for k, v in state.items()}
    for f in range(8):
        img, _, _, state = restir.render_restir(
            scene, materials, lights, cam, W, H, seed=7, frame=f,
            state=state, m_candidates=8, spatial_taps=1)
        assert {k: (v.shape, v.dtype) for k, v in state.items()} == shapes
        if f == 0:
            first = _rmse(img, truth)
        last = _rmse(img, truth)
    # the single per-frame visibility ray keeps a noise floor — history
    # improves the RESAMPLING quality, not the visibility estimate
    # (measured 0.041 -> 0.027 on these deterministic seeds)
    assert last < first * 0.72, (first, last)
    assert float(state["m"].max()) <= restir.M_CAP * 8 + 8 * 2 + 1


def test_restir_temporal_mean_near_truth(setup):
    """With temporal+spatial reuse ON (the biased variant), steady-state
    frames stay close to the truth in the mean — the similarity-rejection
    bias is small on this scene."""
    scene, materials, lights, cam, truth = setup
    state = restir.empty_reservoir_state(W, H)
    acc = np.zeros((H, W, 3), np.float32)
    warm, n = 4, 24
    for f in range(warm + n):
        img, _, _, state = restir.render_restir(
            scene, materials, lights, cam, W, H, seed=11, frame=f,
            state=state, m_candidates=8, spatial_taps=2)
        if f >= warm:
            acc += np.asarray(img)
    mean = acc / n
    scale = float(truth.mean())
    assert abs(float(mean.mean()) - scale) / scale < 0.06


def test_restir_progressive_spp(setup):
    """render_restir_progressive: spp samples with the reservoir carried
    across samples — mean tracks truth, variance drops with spp."""
    scene, materials, lights, cam, truth = setup
    img4, alb, nrm = restir.render_restir_progressive(
        scene, materials, lights, cam, W, H, spp=4, seed=21,
        m_candidates=8, spatial_taps=1)
    img16, _, _ = restir.render_restir_progressive(
        scene, materials, lights, cam, W, H, spp=16, seed=21,
        m_candidates=8, spatial_taps=1)
    assert _rmse(img16, truth) < _rmse(img4, truth)
    assert alb.shape == (H, W, 3) and nrm.shape == (H, W, 3)
    scale = float(truth.mean())
    assert abs(float(np.asarray(img16).mean()) - scale) / scale < 0.08


def test_restir_config_reachable(setup):
    """integrator: "restir" is a first-class config value routed through
    models/common.render_frame (the product's shared frame step)."""
    scene, materials, lights, cam, truth = setup
    from optix_ray_tracer_tpu.io.config import parse_config_dict
    from optix_ray_tracer_tpu.models import common

    cfg = parse_config_dict({"integrator": "restir", "denoise": False,
                             "background": [0.0, 0.0, 0.0]})
    assert cfg.integrator == "restir"
    img, _, _ = common.render_frame(
        cfg, scene, materials, cam, W, H, spp=4, seed=3,
        intersector=None, lights=lights)
    scale = float(truth.mean())
    assert abs(float(np.asarray(img).mean()) - scale) / scale < 0.15
    # lights are auto-collected for restir configs
    assert common.collect_lights(cfg, scene, materials).count == 32
    # and a light-free scene is refused loudly
    from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles
    empty = Scene(spheres=Spheres.empty(), triangles=Triangles.empty())
    with pytest.raises(ValueError, match="emissive"):
        common.render_frame(cfg, empty, materials, cam, W, H, spp=1,
                            seed=0, intersector=None, lights=None)


def test_restir_deterministic(setup):
    scene, materials, lights, cam, _ = setup
    a, _, _, _ = restir.render_restir(scene, materials, lights, cam, W, H,
                                      seed=3, m_candidates=8)
    b, _, _, _ = restir.render_restir(scene, materials, lights, cam, W, H,
                                      seed=3, m_candidates=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restir_guides_and_misses(setup):
    """Albedo/normal guides populated at hits; miss pixels show the
    background untouched; emissive panels are visible at full radiance."""
    scene, materials, lights, cam, _ = setup
    img, alb, nrm, _ = restir.render_restir(
        scene, materials, lights, cam, W, H, seed=1, m_candidates=4,
        background=(0.1, 0.2, 0.3))
    img = np.asarray(img)
    nrm = np.asarray(nrm)
    # floor normals point at +z where hit (the floor fills ~27% of frame)
    hit_mask = np.linalg.norm(nrm, axis=-1) > 0.5
    assert 0.15 < hit_mask.mean() < 0.9
    assert np.all(nrm[hit_mask][:, 2] > 0.0)
    assert np.asarray(alb)[hit_mask].max() > 0.5
    # miss pixels pass the background through exactly
    np.testing.assert_allclose(
        img[~hit_mask],
        np.broadcast_to(np.asarray([0.1, 0.2, 0.3], np.float32),
                        img[~hit_mask].shape), atol=1e-6)


# ---------------------------------------------------------------------------
# restir-gi: ReSTIR direct + path-traced indirect (render_restir_gi)
# ---------------------------------------------------------------------------

def _gi_scene():
    """Floor + red bounce wall + mirror sphere + one panel light: real
    indirect transport AND a delta primary, exercising every branch of
    the restir/path partition."""
    from optix_ray_tracer_tpu.scene.geometry import Spheres

    def vquad(cx, z0, y, half):
        a = [cx - half, y, z0 - half]; b = [cx + half, y, z0 - half]
        c = [cx + half, y, z0 + half]; d = [cx - half, y, z0 + half]
        return [[a, b, c], [a, c, d]]

    mb = MaterialBuilder()
    floor_m = mb.add_rough((0.7, 0.7, 0.7))
    red_m = mb.add_rough((0.8, 0.1, 0.1))
    metal_m = mb.add_metal((0.9, 0.9, 0.9), 0.0)
    em = mb.add_emissive((18.0, 16.0, 13.0))
    verts = _quad(0.0, 0.0, 0.0, 3.0); mats = [floor_m, floor_m]
    verts += vquad(0.0, 1.0, -2.0, 2.0); mats += [red_m, red_m]
    verts += _quad(0.5, 0.5, 2.5, 0.4); mats += [em, em]
    v = np.asarray(verts, np.float32)
    n = np.zeros_like(v)
    n[0:2, :, 2] = 1.0; n[2:4, :, 1] = 1.0; n[4:6, :, 2] = 1.0
    tris = Triangles.from_arrays(v, n, np.asarray(mats, np.int32))
    scene = Scene(
        spheres=Spheres.from_list([((-0.8, 0.6, 0.5), 0.5, metal_m)]),
        triangles=tris)
    materials = mb.build()
    lights = collect_area_lights(scene, materials)
    cam = Camera.look_at((0.0, 4.5, 2.5), (0.0, 0.0, 0.3), (0.0, 1.0, 0.0))
    return scene, materials, lights, cam


BG_GI = (0.05, 0.06, 0.08)


@pytest.fixture(scope="module")
def gi_setup():
    from optix_ray_tracer_tpu.render.pathtracer import render_path

    scene, materials, lights, cam = _gi_scene()
    # pixel-center truth (jitter=False): restir renders pixel centers, so
    # a jittered truth would differ at silhouettes by antialiasing alone
    truth, _, _ = render_path(scene, materials, lights, cam, W, H,
                              spp=800, seed=99, max_depth=5,
                              background=BG_GI, jitter=False)
    return scene, materials, lights, cam, np.asarray(truth)


def test_restir_gi_unbiased(gi_setup):
    """ReSTIR-direct + restir_direct path continuation partition exactly:
    the mean over independent frames matches the full path tracer."""
    scene, materials, lights, cam, truth = gi_setup

    frame_fn = jax.jit(lambda s: restir.render_restir_gi(
        scene, materials, lights, cam, W, H, seed=s, m_candidates=8,
        spatial_taps=0, max_depth=5, background=BG_GI)[0])
    acc = np.zeros((H, W, 3), np.float32)
    n = 120
    for f in range(n):
        acc += np.asarray(frame_fn(jnp.int32(1000 + f)))
    mean = acc / n
    scale = float(truth.mean())
    assert abs(float(mean.mean()) - scale) / scale < 0.02
    assert _rmse(mean, truth) / scale < 0.15


def test_restir_gi_equal_budget(setup):
    """Same ray budget per sample as the path tracer, lower error where
    direct lighting dominates (the 16-light unequal-power module scene;
    on single-light indirect-heavy scenes the two are comparable — the
    reservoir only accelerates the direct term)."""
    from optix_ray_tracer_tpu.render.pathtracer import render_path

    scene, materials, lights, cam, _ = setup
    truth, _, _ = render_path(scene, materials, lights, cam, W, H,
                              spp=1200, seed=99, max_depth=4,
                              jitter=False)
    p4, _, _ = render_path(scene, materials, lights, cam, W, H, spp=4,
                           seed=5, max_depth=4, jitter=False)
    g4, _, _ = restir.render_restir_gi_progressive(
        scene, materials, lights, cam, W, H, spp=4, seed=5,
        m_candidates=16, spatial_taps=1, max_depth=4)
    # measured ~2x on this scene (deterministic seeds)
    assert _rmse(g4, truth) < _rmse(p4, truth) / 1.3


def test_restir_gi_config_reachable(gi_setup):
    """integrator: "restir-gi" routes through the product frame step and
    keeps full transport (indirect > 0 where DI-only restir is dark)."""
    scene, materials, lights, cam, truth = gi_setup
    from optix_ray_tracer_tpu.io.config import parse_config_dict
    from optix_ray_tracer_tpu.models import common

    cfg = parse_config_dict({"integrator": "restir-gi", "denoise": False,
                             "background": list(BG_GI), "max-depth": 5})
    assert cfg.integrator == "restir-gi"
    img, _, _ = common.render_frame(
        cfg, scene, materials, cam, W, H, spp=4, seed=3,
        intersector=None, lights=lights)
    scale = float(truth.mean())
    assert abs(float(np.asarray(img).mean()) - scale) / scale < 0.12
    # lights auto-collected for restir-gi configs too
    assert common.collect_lights(cfg, scene, materials).count == 2
