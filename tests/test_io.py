"""IO-layer tests: VTK/STL/series/config parsing, cache subsystem.

Time-mode tests parse the reference's shipped sample data directly
(/root/reference/files, read-only) — the de-facto golden fixtures
(reference README.md:13).  Mesh-mode fixtures are synthesized since the
reference does not ship particle_mesh VTK files.
"""

import json
import os

import numpy as np
import pytest

from optix_ray_tracer_tpu.io import cache as cache_io
from optix_ray_tracer_tpu.io.config import ConfigError, load_config, parse_config_dict
from optix_ray_tracer_tpu.io.series import load_stl_directory, read_series
from optix_ray_tracer_tpu.io.stl import read_stl
from optix_ray_tracer_tpu.io.vtk import (
    VTKParseError, parse_polydata, read_mesh_file, read_polydata,
    read_time_file, write_polydata,
)

REF = "/root/reference/files"
HAVE_REF = os.path.isdir(REF)


MESH_VTK = """# vtk DataFile Version 2.0
synthetic strip fixture
ASCII
DATASET POLYDATA
POINTS 8 double
0 0 0
1 0 0
0 1 0
1 1 0
2 0 1
3 0 1
2 1 1
3 1 1
TRIANGLE_STRIPS 2 10
4 0 1 2 3
4 4 5 6 7
CELL_DATA 2
SCALARS id int 1
LOOKUP_TABLE default
0
1
VECTORS vel double
0 0 -1
0 0 -2
"""


class TestPolyData:
    def test_rejects_non_vtk(self):
        with pytest.raises(VTKParseError):
            parse_polydata("hello world")

    def test_rejects_binary(self):
        with pytest.raises(VTKParseError):
            parse_polydata("# vtk DataFile Version 2.0\nc\nBINARY\nDATASET POLYDATA\n")

    def test_parse_strip_fixture(self):
        pd = parse_polydata(MESH_VTK)
        assert pd.num_points == 8
        assert len(pd.triangle_strips) == 2
        assert list(pd.cell_data["id"]) == [0, 1]
        np.testing.assert_allclose(pd.cell_data["vel"][1], [0, 0, -2])


class TestBinaryVTK:
    """Binary legacy payloads (big-endian) — vtkPolyDataReader accepts
    ASCII and binary alike (reference VTKReaderImpl.cpp:27-63)."""

    def _assert_polydata_equal(self, a, b):
        np.testing.assert_array_equal(a.points, b.points)
        assert len(a.triangle_strips) == len(b.triangle_strips)
        for sa, sb in zip(a.triangle_strips, b.triangle_strips):
            np.testing.assert_array_equal(sa, sb)
        assert set(a.point_data) == set(b.point_data)
        assert set(a.cell_data) == set(b.cell_data)
        for k in a.point_data:
            np.testing.assert_array_equal(a.point_data[k], b.point_data[k])
        for k in a.cell_data:
            np.testing.assert_array_equal(a.cell_data[k], b.cell_data[k])

    def test_write_binary_read_back(self, tmp_path):
        pd = parse_polydata(MESH_VTK)
        p = tmp_path / "mesh_bin.vtk"
        write_polydata(p, pd, binary=True)
        pd2 = read_polydata(p)
        self._assert_polydata_equal(pd, pd2)
        assert pd2.cell_data["id"].dtype == pd.cell_data["id"].dtype

    def test_write_ascii_read_back(self, tmp_path):
        pd = parse_polydata(MESH_VTK)
        p = tmp_path / "mesh_ascii.vtk"
        write_polydata(p, pd, binary=False)
        self._assert_polydata_equal(pd, read_polydata(p))

    def test_mesh_view_identical_across_formats(self, tmp_path):
        pa = tmp_path / "a.vtk"
        pa.write_text(MESH_VTK)
        pb = tmp_path / "b.vtk"
        write_polydata(pb, parse_polydata(MESH_VTK), binary=True)
        ma = read_mesh_file(str(pa))
        mb = read_mesh_file(str(pb))
        np.testing.assert_array_equal(ma.ids, mb.ids)
        np.testing.assert_array_equal(ma.velocities, mb.velocities)
        for va, vb in zip(ma.vertices, mb.vertices):
            np.testing.assert_array_equal(va, vb)
        for na, nb in zip(ma.normals, mb.normals):
            np.testing.assert_array_equal(na, nb)

    @pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
    def test_reference_time_file_binary_identical(self, tmp_path):
        src = f"{REF}/particle/particle_000000000000000.vtk"
        pd = read_polydata(src)
        dst = tmp_path / "p0_bin.vtk"
        write_polydata(dst, pd, binary=True)
        ta = read_time_file(src)
        tb = read_time_file(str(dst))
        np.testing.assert_array_equal(ta.positions, tb.positions)
        np.testing.assert_array_equal(ta.ids, tb.ids)
        np.testing.assert_array_equal(ta.quats, tb.quats)
        np.testing.assert_array_equal(ta.velocities, tb.velocities)
        np.testing.assert_array_equal(ta.shape_ids, tb.shape_ids)


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
class TestReferenceData:
    def test_time_file(self):
        tf = read_time_file(f"{REF}/particle/particle_000000000000000.vtk")
        assert tf.positions.shape == (25, 3)
        assert tf.quats.shape == (25, 4)
        assert list(tf.ids) == list(range(25))
        # all velocities are (0, 0, -2) in frame 0 (data_description.txt)
        np.testing.assert_allclose(tf.velocities,
                                   np.tile([0, 0, -2], (25, 1)), atol=1e-12)
        assert tf.shape_ids.min() >= 0

    def test_series_durations(self):
        s = read_series(REF, "particle.vtk.series")
        assert s.count == 401
        # deltas are 0.01 in the manifest
        np.testing.assert_allclose(s.durations[:3], [0.01] * 3, atol=1e-9)
        # last file reuses the final delta
        np.testing.assert_allclose(s.durations[-1], s.durations[-2], atol=1e-9)
        assert all(os.path.exists(p) for p in s.paths[:5])

    def test_stl_library(self):
        meshes = load_stl_directory(f"{REF}/shape/separated")
        assert len(meshes) == 8
        v, n = meshes[0]
        assert v.shape[1:] == (3, 3) and v.shape == n.shape
        assert len(v) > 10
        # normals unit length
        np.testing.assert_allclose(np.linalg.norm(n[:, 0], axis=-1), 1.0,
                                   atol=1e-4)

    def test_reference_config_loads(self):
        cfg = load_config(f"{REF}/config.json")
        assert cfg.mesh is False
        assert cfg.loop_data.window_width == 1200
        assert cfg.loop_data.fps == 240
        assert cfg.particle_material_preset == "terrain"
        assert len(cfg.roughs) == 4 and len(cfg.metals) == 1
        assert cfg.spheres[0].radius == 1000.0
        c, r = cfg.spheres[0].world_center_radius()
        np.testing.assert_allclose(c, [0, 0, -1000.5], atol=1e-3)


class TestMeshFile:
    def test_strip_decode_with_winding_flip(self, tmp_path):
        p = tmp_path / "m.vtk"
        p.write_text(MESH_VTK)
        mf = read_mesh_file(str(p))
        assert len(mf.ids) == 2
        assert mf.vertices[0].shape == (2, 3, 3)  # 4 points -> 2 triangles
        # triangle 0: (p0, p1, p2); triangle 1 (odd): (p1, p3, p2) swapped
        np.testing.assert_allclose(mf.vertices[0][0],
                                   [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
        np.testing.assert_allclose(mf.vertices[0][1],
                                   [[1, 0, 0], [1, 1, 0], [0, 1, 0]])
        np.testing.assert_allclose(mf.velocities[1], [0, 0, -2])

    def test_missing_cell_data_raises(self, tmp_path):
        text = MESH_VTK.split("CELL_DATA")[0]
        p = tmp_path / "bad.vtk"
        p.write_text(text)
        with pytest.raises(VTKParseError):
            read_mesh_file(str(p))


class TestSTL:
    def test_ascii_roundtrip(self, tmp_path):
        p = tmp_path / "t.stl"
        p.write_text("""solid x
facet normal 0 0 1
outer loop
vertex 0 0 0
vertex 1 0 0
vertex 0 1 0
endloop
endfacet
endsolid x
""")
        v, n = read_stl(str(p))
        assert v.shape == (1, 3, 3)
        # recomputed geometric normal is +-z unit
        np.testing.assert_allclose(np.abs(n[0, 0]), [0, 0, 1], atol=1e-6)

    def test_binary(self, tmp_path):
        import struct
        tri = struct.pack("<12f", 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0) + b"\0\0"
        data = b"\0" * 80 + struct.pack("<I", 1) + tri
        p = tmp_path / "b.stl"
        p.write_bytes(data)
        v, n = read_stl(str(p))
        assert v.shape == (1, 3, 3)
        np.testing.assert_allclose(v[0, 0], [0, 0, 0])
        np.testing.assert_allclose(v[0, 2], [0, 1, 0])


class TestConfig:
    def test_defaults_and_extensions(self):
        cfg = parse_config_dict({"mesh": False})
        assert cfg.spp == 1 and cfg.max_depth == 5
        assert cfg.background == (0.7, 0.8, 0.9)

    def test_invalid_api(self):
        with pytest.raises(ConfigError):
            parse_config_dict({"loop-data": {"api": "METAL3"}})

    def test_mat_index_out_of_range(self):
        with pytest.raises(ConfigError):
            parse_config_dict({
                "roughs": [{"albedo": [1, 1, 1]}],
                "spheres": [{"center": [0, 0, 0], "radius": 1,
                             "mat-type": "ROUGH", "mat-index": 5}]})

    def test_bad_vec3(self):
        with pytest.raises(ConfigError):
            parse_config_dict({"roughs": [{"albedo": [1, 1]}]})


class TestCache:
    def _write_series(self, tmp_path, n_files=3):
        d = tmp_path / "data"
        d.mkdir()
        paths = []
        for i in range(n_files):
            p = d / f"m{i}.vtk"
            p.write_text(MESH_VTK)
            paths.append(str(p))
        return paths

    def test_bake_and_load(self, tmp_path):
        paths = self._write_series(tmp_path)
        cache_dir = str(tmp_path / "cache")
        meta = cache_io.write_mesh_cache(cache_dir, paths, thread_count=2)
        assert meta["max_cell_count"] == 2
        assert cache_io.cache_is_valid(cache_dir, paths)
        f = cache_io.read_mesh_cache(cache_dir, 0)
        assert f.vertices.shape == (4, 3, 3)  # 2 particles x 2 triangles
        assert list(f.tri_counts) == [2, 2]

    def test_stale_on_source_change(self, tmp_path):
        paths = self._write_series(tmp_path)
        cache_dir = str(tmp_path / "cache")
        cache_io.write_mesh_cache(cache_dir, paths, thread_count=1)
        os.utime(paths[0], (0, 0))  # change mtime
        assert not cache_io.cache_is_valid(cache_dir, paths)

    def test_load_or_bake_auto(self, tmp_path):
        paths = self._write_series(tmp_path)
        cache_dir = str(tmp_path / "cache")
        frames = cache_io.load_or_bake(cache_dir, paths, thread_count=2)
        assert len(frames) == 3
        assert os.path.exists(os.path.join(cache_dir, "metadata.json"))

    def test_version_mismatch_invalidates(self, tmp_path):
        paths = self._write_series(tmp_path)
        cache_dir = str(tmp_path / "cache")
        cache_io.write_mesh_cache(cache_dir, paths, thread_count=1)
        meta_path = os.path.join(cache_dir, "metadata.json")
        meta = json.load(open(meta_path))
        meta["version"] = 0
        json.dump(meta, open(meta_path, "w"))
        assert not cache_io.cache_is_valid(cache_dir, paths)
