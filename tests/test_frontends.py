"""Frontend tests: Mesh- and Time-mode renderer drivers end-to-end.

Time mode drives the reference's real shipped dataset (particle poses + STL
shape library).  Mesh mode uses synthesized TRIANGLE_STRIPS fixtures (the
reference does not ship mesh-mode VTK files).
"""

import json
import os

import numpy as np
import pytest

from optix_ray_tracer_tpu.io.config import parse_config_dict
from optix_ray_tracer_tpu.models import renderer_mesh, renderer_time

REF = "/root/reference/files"
HAVE_REF = os.path.isdir(REF)

MESH_VTK = open(os.path.join(os.path.dirname(__file__), "test_io.py")) \
    .read().split('MESH_VTK = """')[1].split('"""')[0]


def _mesh_config(tmp_path, n_files=2):
    data_dir = tmp_path / "data"
    data_dir.mkdir(exist_ok=True)
    entries = []
    for i in range(n_files):
        name = f"m{i}.vtk"
        (data_dir / name).write_text(MESH_VTK)
        entries.append({"name": name, "time": i * 0.5})
    series = data_dir / "test.vtk.series"
    series.write_text(json.dumps({"file-series-version": "1.0",
                                  "files": entries}))
    return parse_config_dict({
        "mesh": True,
        "series-path": str(data_dir),
        "series-name": "test.vtk.series",
        "cache-path": str(tmp_path / "cache"),
        "stl-path": str(data_dir),
        "cache": False,
        "particle-material-preset": "viridis",
        "roughs": [{"albedo": [0.7, 0.6, 0.5]}],
        "metals": [],
        "spheres": [{"center": [0, 0, 0], "radius": 100.0,
                     "mat-type": "ROUGH", "mat-index": 0,
                     "shift": [0, 0, -100.5], "rotate": [0, 0, 0],
                     "scale": [1, 1, 1]}],
        "loop-data": {"api": "HEADLESS", "window-width": 32,
                      "window-height": 24, "fps": 4,
                      "camera-center": [6, 0, 1],
                      "camera-target": [0.5, 0.5, 0.25],
                      "up-direction": [0, 0, 1],
                      "render-speed-ratio": 1,
                      "particle-shift": [0, 0, 0],
                      "particle-scale": [1, 1, 1]},
    }, base_dir=str(tmp_path))


class TestMeshFrontend:
    @pytest.mark.slow
    def test_commit_and_render(self, tmp_path):
        cfg = _mesh_config(tmp_path)
        data = renderer_mesh.commit(cfg)
        assert data.file_count == 2
        assert data.max_triangles == 4  # 2 particles x 2 tris
        frames = list(renderer_mesh.render_frames(data, max_frames=3))
        assert len(frames) == 3
        fi, k, film = frames[0]
        img = film.to_uint8()
        assert img.shape == (24, 32, 4)
        assert not np.isnan(np.asarray(film.mean())).any()

    def test_velocity_animation_moves_geometry(self, tmp_path):
        cfg = _mesh_config(tmp_path)
        data = renderer_mesh.commit(cfg)
        n_frames = 4
        s0 = renderer_mesh.frame_scene(data, 0, 0, n_frames)
        s3 = renderer_mesh.frame_scene(data, 0, 3, n_frames)
        v0 = np.asarray(s0.triangles.vertices)
        v3 = np.asarray(s3.triangles.vertices)
        # velocity (0,0,-1), duration 0.5, frame 3/4 -> z shift -0.375
        dz = v3[0, 0, 2] - v0[0, 0, 2]
        np.testing.assert_allclose(dz, -1.0 * 0.5 * 3 / 4, atol=1e-5)
        # particle 1 (vel -2) shifts twice as far (its triangles are 2..3)
        dz1 = v3[2, 0, 2] - v0[2, 0, 2]
        np.testing.assert_allclose(dz1, -2.0 * 0.5 * 3 / 4, atol=1e-5)

    def test_cache_bake_entrypoint(self, tmp_path):
        cfg = _mesh_config(tmp_path)
        meta = renderer_mesh.write_cache_files(cfg)
        assert meta["file_count"] == 2
        assert meta["max_cell_count"] == 2

    @pytest.mark.slow
    def test_update_fn_hook(self, tmp_path):
        cfg = _mesh_config(tmp_path)
        data = renderer_mesh.commit(cfg)
        calls = []

        def hook(spheres, frame_idx):
            calls.append(frame_idx)
            return None

        renderer_mesh.set_update_fn(data, hook)
        list(renderer_mesh.render_frames(data, max_frames=2))
        assert calls == [0, 1]


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
class TestTimeFrontend:
    @pytest.fixture(scope="class")
    def config(self):
        with open(f"{REF}/config.json") as f:
            raw = json.load(f)
        raw["series-name"] = "particle-short.vtk.series"
        raw["series-path"] = REF
        raw["stl-path"] = f"{REF}/shape/separated/"
        raw["loop-data"]["window-width"] = 32
        raw["loop-data"]["window-height"] = 24
        raw["loop-data"]["fps"] = 2
        raw["loop-data"]["render-speed-ratio"] = 50  # 0.01s * 2 * 50 = 1 frame
        return parse_config_dict(raw, base_dir=REF)

    @pytest.fixture(scope="class")
    def data(self, config):
        return renderer_time.commit(config)

    def test_commit_reference_scene(self, data):
        assert data.library.num_shapes == 8
        assert data.file_count == 71
        # particles are injected over the series: frame 0 has 25, later
        # frames more; padding is to the max across files
        assert data.positions.shape[1] >= 25
        assert int(data.particle_valid[0].sum()) == 25

    @pytest.mark.slow
    def test_render_reference_frames(self, data):
        frames = list(renderer_time.render_frames(data, max_frames=2))
        assert len(frames) == 2
        _, _, film = frames[0]
        img = film.to_uint8()
        assert img.shape == (24, 32, 4)
        # sky background must appear (0.7, 0.8, 0.9) sRGB at the top
        np.testing.assert_array_equal(img[0, 0, :3], [218, 232, 244])

    def test_slerp_animation_rotates(self, data):
        # between files, orientation interpolates; frame 0 vs later frame of
        # a multi-frame segment must move geometry unless the scene is static
        s0 = renderer_time.frame_scene(data, 0, 0, 2)
        s1 = renderer_time.frame_scene(data, 0, 1, 2)
        v0 = np.asarray(s0.triangles.vertices)
        v1 = np.asarray(s1.triangles.vertices)
        # particles fall at (0,0,-2): z must decrease by vel*duration*1/2
        moved = v1 - v0
        valid = np.abs(v0).sum(axis=(1, 2)) > 0
        assert np.abs(moved[valid][..., 2].mean() + 2.0 * 0.01 / 2) < 1e-4

    def test_padded_particles_do_not_render(self, data):
        # padded instance slots must produce degenerate (never-hit) triangles
        s = renderer_time.frame_scene(data, 0, 0, 2)
        v = np.asarray(s.triangles.vertices)
        budget = int(data.library.counts.max())
        # there are 25 particles; shapes 2..7 have 2 triangles but budget is
        # max shape size, so most slots are zeroed padding
        n_degenerate = (np.abs(v).sum(axis=(1, 2)) == 0).sum()
        assert n_degenerate > 0


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
class TestFusedEquivalence:
    """The fused chunk pipeline (models/fused.py: divisor chunking,
    software-pipelined transfers, device rebuild per file) must produce
    the SAME images as the per-frame fallback loop."""

    @pytest.fixture(scope="class")
    def data(self):
        with open(f"{REF}/config.json") as f:
            raw = json.load(f)
        raw["series-name"] = "particle-short.vtk.series"
        raw["series-path"] = REF
        raw["stl-path"] = f"{REF}/shape/separated/"
        raw["loop-data"]["window-width"] = 32
        raw["loop-data"]["window-height"] = 24
        # temporal reprojection exists ONLY in the fused path (by design);
        # turn it off for the exact fused == per-frame comparison
        raw["temporal"] = False
        # 0.01 s * 200 fps * 9 ratio = 18 frames/file -> chunk 9: two
        # chunks per file, exercising the chunk pipeline + a file
        # boundary (device rebuild) inside max_frames
        raw["loop-data"]["fps"] = 200
        raw["loop-data"]["render-speed-ratio"] = 9
        cfg = parse_config_dict(raw, base_dir=REF)
        return renderer_time.commit(cfg)

    @pytest.mark.slow
    def test_fused_neural_denoiser_branch(self, data, tmp_path,
                                          monkeypatch):
        """config denoise='neural' routes the fused chunk through the
        learned filter (synthetic weights: wiring, not quality)."""
        from optix_ray_tracer_tpu.render import neural_denoise as nd

        wfile = str(tmp_path / "w.npz")
        nd.save_params(nd.init_params(seed=3), wfile)
        monkeypatch.setattr(nd, "_WEIGHTS_FILE", wfile)
        monkeypatch.setattr(nd, "_DEFAULT", None)
        cfg = data.config
        old = (cfg.denoiser, cfg.temporal)
        cfg.denoiser = "neural"
        try:
            for temporal in (False, True):   # both postprocess branches
                cfg.temporal = temporal
                frames = [np.asarray(film.mean())
                          for _, _, film in renderer_time.render_frames(
                              data, max_frames=2)]
                assert len(frames) == 2
                for f in frames:
                    assert np.isfinite(f).all()
                    assert f.std() > 0.01      # rendered something
        finally:
            cfg.denoiser, cfg.temporal = old

    @pytest.mark.slow
    def test_fused_matches_per_frame(self, data):
        n = 20  # spans 2 chunks of file 0 + the start of file 1
        fused_frames = [(fi, k, film.mean())
                        for fi, k, film in renderer_time.render_frames(
                            data, max_frames=n)]
        # a no-op update hook forces the per-frame fallback path
        renderer_time.set_update_fn(data, lambda spheres, k: None)
        try:
            plain_frames = [(fi, k, film.mean())
                            for fi, k, film in renderer_time.render_frames(
                                data, max_frames=n)]
        finally:
            data.update_fn = None
        assert [(a, b) for a, b, _ in fused_frames] == \
               [(a, b) for a, b, _ in plain_frames]
        for (_, _, fa), (_, _, fb) in zip(fused_frames, plain_frames):
            np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                       rtol=1e-5, atol=1e-6)
