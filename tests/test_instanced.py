"""Instance-level TLAS traversal (ops/instanced.py) vs a flattened
brute-force oracle: exactness of t / hit mask / mapped prim ids, plus
the memory-scaling property that motivates the two-level structure."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optix_ray_tracer_tpu.io.meshgen import sphere_with_n_triangles
from optix_ray_tracer_tpu.ops.instanced import (
    build_instanced_library, make_instanced_intersector,
)
from optix_ray_tracer_tpu.ops.intersect import intersect_scene_bruteforce
from optix_ray_tracer_tpu.scene.camera import Camera
from optix_ray_tracer_tpu.scene.geometry import Scene, Spheres, Triangles


def _library(sizes=(80, 200, 450)):
    meshes = [sphere_with_n_triangles(s)[0] for s in sizes]
    counts = np.asarray([m.shape[0] for m in meshes], np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    lib = np.concatenate(meshes, axis=0).astype(np.float32)
    return lib, offsets, counts


def _random_poses(P, seed=0, spread=6.0):
    rng = np.random.default_rng(seed)
    # random rotations via normalized quaternions
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


def _flatten(lib, offsets, counts, shape_ids, rot, shift, scale):
    """The oracle's world geometry, in (instance-major) packing order;
    returns (verts, flat_base) where flat_base[p] is instance p's first
    flat triangle index."""
    out, base = [], []
    w = 0
    for p, s in enumerate(shape_ids):
        lo, c = int(offsets[s]), int(counts[s])
        v = lib[lo:lo + c] * scale
        out.append(np.einsum("ij,tkj->tki", rot[p], v) + shift[p])
        base.append(w)
        w += c
    return np.concatenate(out, 0).astype(np.float32), np.asarray(base)


class TestInstancedTLAS:
    @pytest.mark.slow
    @pytest.mark.parametrize("P,scale", [(12, 1.0), (40, 0.7)])
    def test_matches_flattened_oracle(self, P, scale):
        lib, offsets, counts = _library()
        rng = np.random.default_rng(3)
        shape_ids = rng.integers(0, len(counts), P)
        rot, shift = _random_poses(P, seed=P)

        library = build_instanced_library(lib, offsets, counts)
        inter = make_instanced_intersector(library, shape_ids, rot, shift,
                                           scale)

        flat, base = _flatten(lib, offsets, counts, shape_ids, rot, shift,
                              scale)
        scene = Scene(spheres=Spheres.empty(),
                      triangles=Triangles.from_arrays(flat))

        cam = Camera.look_at((16.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             (0.0, 0.0, 1.0))
        o, d = cam.generate_rays(48, 32)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        # plus incoherent rays from inside the cloud
        oi = jnp.asarray(rng.uniform(-5, 5, (512, 3)).astype(np.float32))
        di = rng.normal(size=(512, 3)).astype(np.float32)
        di /= np.linalg.norm(di, axis=-1, keepdims=True)
        o = jnp.concatenate([o, oi], 0)
        d = jnp.concatenate([d, jnp.asarray(di)], 0)

        hit, inst = inter.intersect(o, d)
        ref = intersect_scene_bruteforce(scene, o, d)

        got_hit = np.asarray(hit.is_hit)
        ref_hit = np.asarray(ref.is_hit)
        assert ref_hit.mean() > 0.15          # scene actually in view
        np.testing.assert_array_equal(got_hit, ref_hit)
        np.testing.assert_allclose(np.asarray(hit.t)[got_hit],
                                   np.asarray(ref.t)[ref_hit],
                                   rtol=2e-4, atol=2e-5)
        # prim identity through the (instance, library tri) -> flat map
        inst_np = np.asarray(inst)[got_hit]
        lib_tri = np.asarray(hit.prim_id)[got_hit]
        flat_id = (base[inst_np] + lib_tri
                   - offsets[shape_ids[inst_np]]).astype(np.int64)
        ref_id = np.asarray(ref.prim_id)[ref_hit]
        # ties (two instances' triangles at equal t) may map differently;
        # require 99%+ identity and t-equality for the rest
        agree = (flat_id == ref_id).mean()
        assert agree > 0.99

    @pytest.mark.slow
    def test_any_hit_occlusion(self):
        lib, offsets, counts = _library((120,))
        library = build_instanced_library(lib, offsets, counts)
        rot, shift = _random_poses(6, seed=9, spread=3.0)
        inter = make_instanced_intersector(library, [0] * 6, rot, shift)
        flat, _ = _flatten(lib, offsets, counts, [0] * 6, rot, shift, 1.0)
        scene = Scene(spheres=Spheres.empty(),
                      triangles=Triangles.from_arrays(flat))
        rng = np.random.default_rng(1)
        o = jnp.asarray(rng.uniform(-4, 4, (256, 3)).astype(np.float32))
        dd = rng.normal(size=(256, 3)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
        d = jnp.asarray(dd)
        full = inter.intersect(o, d)[0]
        cap = jnp.where(full.is_hit, full.t + 0.1, 2.0)
        got = np.asarray(inter.any_hit(o, d, t_max=cap))
        ref = np.asarray(
            intersect_scene_bruteforce(scene, o, d).t <= cap)
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("mode", ["camera", "occlusion"])
    def test_raster_pairs_match_marcher(self, mode):
        """The TLAS raster path (ops/raster_instanced.py) vs the sorted
        instanced marcher on a coherent camera wave: identical hit
        masks, matching t and (instance, prim) identity."""
        lib, offsets, counts = _library((80, 200))
        library = build_instanced_library(lib, offsets, counts)
        P = 10
        rng = np.random.default_rng(11)
        shape_ids = rng.integers(0, len(counts), P)
        rot, shift = _random_poses(P, seed=5, spread=3.0)
        inter = make_instanced_intersector(library, shape_ids, rot, shift)

        cam = Camera.look_at((9.0, 0.5, 1.0), (0.0, 0.0, 0.0),
                             (0.0, 0.0, 1.0))
        o, d = cam.generate_rays(32, 32)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        point = jnp.asarray((9.0, 0.5, 1.0), jnp.float32)

        if mode == "occlusion":
            got = np.asarray(inter.any_hit_from(
                o, d, mode="origin", point=point, block_rays=256))
            want = np.asarray(inter.any_hit(o, d))
            np.testing.assert_array_equal(got, want)
            return
        hit_r, inst_r = inter.intersect_from(
            o, d, mode="origin", point=point, block_rays=256)
        hit_m, inst_m = inter.intersect(o, d)
        hr = np.asarray(hit_r.is_hit)
        assert hr.mean() > 0.1          # scene actually in view
        np.testing.assert_array_equal(hr, np.asarray(hit_m.is_hit))
        np.testing.assert_allclose(np.asarray(hit_r.t)[hr],
                                   np.asarray(hit_m.t)[hr],
                                   rtol=1e-5, atol=1e-6)
        # identity can differ only on exact-t ties between engines
        same = ((np.asarray(inst_r) == np.asarray(inst_m))
                & (np.asarray(hit_r.prim_id) == np.asarray(hit_m.prim_id)))
        assert same[hr].mean() > 0.99

    def test_raster_pairs_overflow_falls_back(self):
        """An undersized pc_max must not silently corrupt results — the
        lax.cond fallback re-traces the wave with the exact marcher."""
        lib, offsets, counts = _library((120,))
        library = build_instanced_library(lib, offsets, counts)
        rot, shift = _random_poses(8, seed=3, spread=3.0)
        inter = make_instanced_intersector(library, [0] * 8, rot, shift)
        cam = Camera.look_at((10.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                             (0.0, 0.0, 1.0))
        o, d = cam.generate_rays(32, 16)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        hit_r, inst_r = inter.intersect_from(
            o, d, mode="origin", point=(10.0, 0.0, 0.0), block_rays=256,
            pc_max=1024)   # deliberately tiny -> overflow on some waves
        hit_m, inst_m = inter.intersect(o, d)
        np.testing.assert_array_equal(np.asarray(hit_r.is_hit),
                                      np.asarray(hit_m.is_hit))
        m = np.asarray(hit_r.is_hit)
        np.testing.assert_allclose(np.asarray(hit_r.t)[m],
                                   np.asarray(hit_m.t)[m],
                                   rtol=1e-5, atol=1e-6)

    def test_memory_scales_with_library_not_instances(self):
        lib, offsets, counts = _library((300,))
        library = build_instanced_library(lib, offsets, counts)
        lib_bytes = library.woop_t.nbytes + library.woop.nbytes
        for P in (10, 200):
            rot, shift = _random_poses(P)
            inter = make_instanced_intersector(library, [0] * P, rot,
                                               shift)
            per_frame = (inter.pair_min.nbytes + inter.pair_max.nbytes
                         + inter.sub_min.nbytes + inter.sub_max.nbytes
                         + inter.inst_rows.nbytes)
            # geometry is NOT duplicated per instance: frame state is a
            # few hundred bytes per instance, library bytes are constant
            assert inter.library.woop_t.nbytes == library.woop_t.nbytes
            assert per_frame < lib_bytes * (1 + P // 50)

    def test_refit_tracks_moving_instances(self):
        """Refitting the pair boxes for new poses keeps queries exact —
        the per-frame updateIAS analog of the TLAS path."""
        import dataclasses as dc

        lib, offsets, counts = _library((150,))
        library = build_instanced_library(lib, offsets, counts)
        rot, shift = _random_poses(8, seed=2, spread=4.0)
        inter = make_instanced_intersector(library, [0] * 8, rot, shift)

        # move: translate + new rotations
        rot2, _ = _random_poses(8, seed=7)
        shift2 = shift + np.asarray([1.5, -0.5, 2.0], np.float32)
        from optix_ray_tracer_tpu.ops.instanced import refit_instanced
        pmin, pmax, smin, smax, rows = refit_instanced(
            library, inter.pair_shape, inter.pair_inst,
            jnp.asarray(rot2), jnp.asarray(shift2), jnp.float32(1.0),
            jnp.ones((8,), bool))
        inter2 = dc.replace(inter, pair_min=pmin, pair_max=pmax,
                            sub_min=smin, sub_max=smax, inst_rows=rows,
                            scene_lo=pmin.min(0), scene_hi=pmax.max(0))

        flat, _ = _flatten(lib, offsets, counts, [0] * 8, rot2, shift2, 1.0)
        scene = Scene(spheres=Spheres.empty(),
                      triangles=Triangles.from_arrays(flat))
        rng = np.random.default_rng(4)
        o = jnp.asarray(rng.uniform(-3, 6, (384, 3)).astype(np.float32))
        dd = rng.normal(size=(384, 3)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
        d = jnp.asarray(dd)
        hit, _ = inter2.intersect(o, d)
        ref = intersect_scene_bruteforce(scene, o, d)
        np.testing.assert_array_equal(np.asarray(hit.is_hit),
                                      np.asarray(ref.is_hit))
        m = np.asarray(hit.is_hit)
        np.testing.assert_allclose(np.asarray(hit.t)[m],
                                   np.asarray(ref.t)[m],
                                   rtol=2e-4, atol=2e-5)
