"""Product-level TLAS routing (ops/tlas.py + models/renderer_time.py).

VERDICT r4 #6: the two-level engine must be reachable from the product —
the integrators consume a :class:`TLASSceneIntersector` whose hits live
in the VIRTUAL flattened prim-id space and whose shading is a lazy
(library, instance) gather, so Time-mode scenes too large to flatten
render end-to-end.  Oracles here are the flatten path itself.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from optix_ray_tracer_tpu.io.meshgen import sphere_with_n_triangles
from optix_ray_tracer_tpu.ops import intersect as isect
from optix_ray_tracer_tpu.ops.instanced import (
    build_instanced_library, make_instanced_intersector,
)
from optix_ray_tracer_tpu.ops.tlas import TLASSceneIntersector
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles

REF = "/root/reference/files"
HAVE_REF = os.path.isdir(REF)


def _library(sizes=(80, 200)):
    meshes = [sphere_with_n_triangles(s) for s in sizes]
    counts = np.asarray([m[0].shape[0] for m in meshes], np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    lv = np.concatenate([m[0] for m in meshes], 0).astype(np.float32)
    ln = np.concatenate([m[1] for m in meshes], 0).astype(np.float32)
    return lv, ln, offsets, counts


def _random_poses(P, seed=0, spread=5.0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(P, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    rot = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=1).reshape(P, 3, 3).astype(np.float32)
    shift = rng.uniform(-spread, spread, (P, 3)).astype(np.float32)
    return rot, shift


def _setup(P=10, scale=1.0, seed=3):
    """Adapter + its flatten-path oracle scene (dynamic + one static
    ground triangle), sharing the commit() packing order."""
    lv, ln, offsets, counts = _library()
    library = build_instanced_library(lv, offsets, counts)
    rng = np.random.default_rng(seed)
    sid = rng.integers(0, len(counts), P)
    rot, shift = _random_poses(P, seed=seed)
    pmat = rng.integers(0, 5, P).astype(np.int32)

    tlas = make_instanced_intersector(library, sid, rot, shift, scale)

    # virtual packing tables (the commit() layout)
    tri_lib, tri_inst, base = [], [], []
    w = 0
    for p in range(P):
        lo, c = int(offsets[sid[p]]), int(counts[sid[p]])
        tri_lib.extend(range(lo, lo + c))
        tri_inst.extend([p] * c)
        base.append(w)
        w += c
    adapter = TLASSceneIntersector(
        tlas=tlas,
        tri_lib=jnp.asarray(tri_lib, jnp.int32),
        tri_inst=jnp.asarray(tri_inst, jnp.int32),
        inst_base=jnp.asarray(base, jnp.int32),
        inst_tri_off=jnp.asarray(offsets[sid], jnp.int32),
        lib_normals=jnp.asarray(ln), rot=jnp.asarray(rot),
        pmat=jnp.asarray(pmat))

    # flatten oracle: world triangles in the same packing order
    fv, fn = [], []
    for p in range(P):
        lo, c = int(offsets[sid[p]]), int(counts[sid[p]])
        fv.append(np.einsum("ij,tkj->tki", rot[p], lv[lo:lo + c] * scale)
                  + shift[p])
        fn.append(np.einsum("ij,tkj->tki", rot[p], ln[lo:lo + c]))
    sv = np.asarray([[[-30, -30, -8], [30, -30, -8], [0, 30, -8]]],
                    np.float32)
    sn = np.broadcast_to(np.asarray([0, 0, 1], np.float32),
                         (1, 3, 3)).copy()
    flat = Scene(
        spheres=Spheres.empty(),
        triangles=Triangles(
            jnp.asarray(np.concatenate(fv + [sv], 0)),
            jnp.asarray(np.concatenate(fn + [sn], 0)),
            jnp.asarray(np.concatenate(
                [pmat[np.asarray(tri_inst)], [7]]).astype(np.int32))))
    static = Scene(spheres=Spheres.empty(),
                   triangles=Triangles(jnp.asarray(sv), jnp.asarray(sn),
                                       jnp.asarray([7], jnp.int32)))
    return adapter, flat, static, w


def _rays(n=512, seed=11):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestTLASAdapter:
    def test_virtual_ids_match_flatten(self):
        """adapter.intersect returns the id the flatten path would."""
        adapter, flat, static, _ = _setup()
        o, d = _rays()
        ha = adapter.intersect(static, o, d)
        ho = isect.intersect_scene_bruteforce(flat, o, d)
        np.testing.assert_array_equal(np.asarray(ha.is_hit),
                                      np.asarray(ho.is_hit))
        m = np.asarray(ho.is_hit)
        assert m.sum() > 50
        np.testing.assert_array_equal(np.asarray(ha.prim_id)[m],
                                      np.asarray(ho.prim_id)[m])
        np.testing.assert_allclose(np.asarray(ha.t)[m],
                                   np.asarray(ho.t)[m], rtol=1e-5)

    def test_static_extras_merge(self):
        """Rays that only see the ground hit it with the post-dynamic
        virtual id."""
        adapter, flat, static, n_dyn = _setup()
        o = jnp.asarray(np.tile([[25.0, -25.0, 0.0]], (8, 1)),
                        jnp.float32)
        d = jnp.asarray(np.tile([[0.0, 0.0, -1.0]], (8, 1)), jnp.float32)
        ha = adapter.intersect(static, o, d)
        assert bool(ha.is_hit.all())
        np.testing.assert_array_equal(np.asarray(ha.prim_id),
                                      np.full(8, n_dyn))

    def test_shading_matches_flatten(self):
        """Lazy instanced shading == the flatten scene's table shading."""
        adapter, flat, static, _ = _setup()
        o, d = _rays(seed=12)
        ha = adapter.intersect(static, o, d)
        pa, na, ffa, ma = adapter.shading_frame(static, o, d, ha)
        po, no, ffo, mo = isect.shading_frame(flat, o, d, ha)
        m = np.asarray(ha.is_hit)
        np.testing.assert_array_equal(np.asarray(ma)[m], np.asarray(mo)[m])
        np.testing.assert_array_equal(np.asarray(ffa)[m],
                                      np.asarray(ffo)[m])
        np.testing.assert_allclose(np.asarray(na)[m], np.asarray(no)[m],
                                   rtol=1e-4, atol=1e-5)

    def test_any_hit_occlusion(self):
        adapter, flat, static, _ = _setup()
        o, d = _rays(seed=13)
        occ_a = adapter.any_hit(static, o, d, t_max=12.0)
        occ_o = isect.intersect_any_bruteforce(flat, o, d, t_max=12.0)
        np.testing.assert_array_equal(np.asarray(occ_a),
                                      np.asarray(occ_o))

    def test_intersect_from_camera_wave(self):
        """The raster route (shared-origin wave) matches brute force."""
        adapter, flat, static, _ = _setup()
        center = np.asarray([14.0, 2.0, 3.0], np.float32)
        rng = np.random.default_rng(5)
        d = rng.normal(size=(256, 3)).astype(np.float32)
        d = d / np.linalg.norm(d, axis=1, keepdims=True)
        # aim at the instance cloud
        d = jnp.asarray(np.where(d[:, 0:1] > 0, -d, d))
        o = jnp.broadcast_to(jnp.asarray(center), (256, 3))
        ha = adapter.intersect_from(static, o, d, mode="origin",
                                    point=center, block_rays=256)
        ho = isect.intersect_scene_bruteforce(flat, o, d)
        np.testing.assert_array_equal(np.asarray(ha.is_hit),
                                      np.asarray(ho.is_hit))
        m = np.asarray(ho.is_hit)
        np.testing.assert_allclose(np.asarray(ha.t)[m],
                                   np.asarray(ho.t)[m], rtol=1e-5)


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
class TestTimeTLASRoute:
    @pytest.fixture(scope="class")
    def data(self):
        from optix_ray_tracer_tpu.io.config import parse_config_dict
        from optix_ray_tracer_tpu.models import renderer_time
        with open(f"{REF}/config.json") as f:
            raw = json.load(f)
        raw["series-name"] = "particle-short.vtk.series"
        raw["series-path"] = REF
        raw["stl-path"] = f"{REF}/shape/separated/"
        raw["loop-data"]["window-width"] = 32
        raw["loop-data"]["window-height"] = 24
        raw["loop-data"]["fps"] = 2
        raw["loop-data"]["render-speed-ratio"] = 50
        cfg = parse_config_dict(raw, base_dir=REF)
        return renderer_time.commit(cfg)

    def test_route_policy(self, data, monkeypatch):
        from optix_ray_tracer_tpu.models import renderer_time
        monkeypatch.delenv("ORT_TIME_TLAS", raising=False)
        # small scene: flatten wins and fits
        assert not renderer_time._tlas_route(data)
        monkeypatch.setenv("ORT_TIME_TLAS", "1")
        assert renderer_time._tlas_route(data)
        monkeypatch.setenv("ORT_TLAS_HBM_MB", "0.0001")
        monkeypatch.delenv("ORT_TIME_TLAS")
        # over budget -> TLAS
        assert renderer_time._tlas_route(data)

    @pytest.mark.slow
    def test_tlas_route_matches_flatten(self, data, monkeypatch):
        """End-to-end: one frame through the TLAS route == the flatten
        route (same integrator, same seed), to raster fp noise."""
        from optix_ray_tracer_tpu.models import renderer_time
        monkeypatch.setenv("ORT_TIME_TLAS", "1")
        fi, k, film_t = next(iter(
            renderer_time.render_frames(data, max_frames=1)))
        monkeypatch.setenv("ORT_TIME_TLAS", "0")
        _, _, film_f = next(iter(
            renderer_time.render_frames(data, max_frames=1)))
        a = np.asarray(film_t.to_uint8(), np.int32)
        b = np.asarray(film_f.to_uint8(), np.int32)
        diff = np.abs(a - b)
        # u/v winner extraction differs by fp accumulation order
        # (~3e-6) — allow a few LSB on a few pixels, nothing visible
        assert diff.max() <= 6, f"max LSB diff {diff.max()}"
        assert (diff > 2).mean() < 0.01
