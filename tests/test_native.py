"""Native C++ IO parity tests: native results must equal the pure-Python
spec implementations on identical inputs (including the reference dataset)."""

import os

import numpy as np
import pytest

from optix_ray_tracer_tpu.io import native_io, stl as stl_py, vtk as vtk_py
from optix_ray_tracer_tpu.native.build import build, load

REF = "/root/reference/files"
HAVE_REF = os.path.isdir(REF)

MESH_VTK = open(os.path.join(os.path.dirname(__file__), "test_io.py")) \
    .read().split('MESH_VTK = """')[1].split('"""')[0]


@pytest.fixture(scope="module")
def lib():
    lib = load()
    if lib is None:
        pytest.skip("native library failed to build")
    return lib


class TestNativeBuild:
    def test_builds(self, lib):
        assert native_io.native_available()


class TestMeshParity:
    def test_strip_fixture(self, lib, tmp_path):
        p = tmp_path / "m.vtk"
        p.write_text(MESH_VTK)
        a = vtk_py.read_mesh_file(str(p))
        b = native_io.read_mesh_file(str(p))
        np.testing.assert_array_equal(a.ids, b.ids)
        np.testing.assert_allclose(a.velocities, b.velocities)
        assert len(a.vertices) == len(b.vertices)
        for va, vb in zip(a.vertices, b.vertices):
            np.testing.assert_allclose(va, vb, atol=1e-6)
        for na, nb in zip(a.normals, b.normals):
            np.testing.assert_allclose(na, nb, atol=1e-5)

    def test_error_on_bad_file(self, lib, tmp_path):
        p = tmp_path / "bad.vtk"
        p.write_text("not a vtk file")
        with pytest.raises(vtk_py.VTKParseError):
            native_io.read_mesh_file(str(p))

    def test_binary_mesh_parity(self, lib, tmp_path):
        """The native parser accepts BINARY legacy payloads and produces
        bit-identical results to the ASCII parse of the same data."""
        pa = tmp_path / "a.vtk"
        pa.write_text(MESH_VTK)
        pb = tmp_path / "b.vtk"
        vtk_py.write_polydata(pb, vtk_py.parse_polydata(MESH_VTK),
                              binary=True)
        a = native_io.read_mesh_file(str(pa))
        b = native_io.read_mesh_file(str(pb))
        np.testing.assert_array_equal(a.ids, b.ids)
        np.testing.assert_array_equal(a.velocities, b.velocities)
        for va, vb in zip(a.vertices, b.vertices):
            np.testing.assert_array_equal(va, vb)
        for na, nb in zip(a.normals, b.normals):
            np.testing.assert_array_equal(na, nb)


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
class TestTimeParity:
    def test_reference_time_file_binary(self, lib, tmp_path):
        src = f"{REF}/particle/particle_000000000000000.vtk"
        dst = tmp_path / "p0_bin.vtk"
        vtk_py.write_polydata(dst, vtk_py.read_polydata(src), binary=True)
        a = native_io.read_time_file(src)
        b = native_io.read_time_file(str(dst))
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.ids, b.ids)
        np.testing.assert_array_equal(a.quats, b.quats)
        np.testing.assert_array_equal(a.velocities, b.velocities)
        np.testing.assert_array_equal(a.shape_ids, b.shape_ids)

    def test_reference_pose_file(self, lib):
        path = f"{REF}/particle/particle_000000000000000.vtk"
        a = vtk_py.read_time_file(path)
        b = native_io.read_time_file(path)
        np.testing.assert_array_equal(a.ids, b.ids)
        np.testing.assert_allclose(a.positions, b.positions, atol=1e-6)
        np.testing.assert_allclose(a.quats, b.quats, atol=1e-6)
        np.testing.assert_allclose(a.velocities, b.velocities, atol=1e-6)
        np.testing.assert_array_equal(a.shape_ids, b.shape_ids)


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
class TestSTLParity:
    def test_reference_shapes(self, lib):
        for name in ("shape_0000000000.stl", "shape_0000000002.stl"):
            path = f"{REF}/shape/separated/{name}"
            va, na = stl_py.read_stl(path)
            vb, nb = native_io.read_stl(path)
            np.testing.assert_allclose(va, vb, atol=1e-6)
            np.testing.assert_allclose(na, nb, atol=1e-5)

    def test_binary_stl(self, lib, tmp_path):
        import struct
        tri = struct.pack("<12f", 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0) + b"\0\0"
        data = b"\0" * 80 + struct.pack("<I", 1) + tri
        p = tmp_path / "b.stl"
        p.write_bytes(data)
        va, na = stl_py.read_stl(str(p))
        vb, nb = native_io.read_stl(str(p))
        np.testing.assert_allclose(va, vb)
        np.testing.assert_allclose(na, nb)
