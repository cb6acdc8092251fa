"""Multi-device animation rendering — the CLI ``--shard`` product path.

The reference is single-GPU by design (docs/technical-details.md:325-328);
this module is the distributed render loop it never had: each animation
frame's pixel grid is tile-sharded over a ``jax.sharding.Mesh`` of all
local devices (``parallel/sharding.py``), guides included so the denoiser
runs on the merged frame.  The counter-based RNG keys off global pixel
ids, so output is bit-identical to the single-device per-frame path for
any mesh shape (tests/test_sharding.py).

The default route is the FUSED sharded scan (models/fused.py with a
mesh): refit + render + denoise + quantize for a whole frame chunk in
one shard_mapped dispatch, each device tracing its row band.  The
per-frame loop below remains as the fallback for host-side per-frame
hooks (``update_fn``), debug mode, and spp not divisible by the sample
axis — the same eligibility rule as the frontends' fused routing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from optix_ray_tracer_tpu.models import common


def render_frames_sharded(data, mode: str, width: int, height: int,
                          spp: int, mesh, max_frames=None,
                          loop: bool = False,
                          quantize: bool = False,
                          fetch_guides: bool = False) -> Iterator[tuple]:
    """Yield (file_index, frame_index, Film|U8Frame) with every frame
    tile-sharded over ``mesh``.  ``height`` is padded up to a tile
    multiple for the render and cropped on output."""
    from optix_ray_tracer_tpu.models import renderer_mesh, renderer_time
    from optix_ray_tracer_tpu.parallel.sharding import (
        render_path_sharded, render_sharded,
    )
    from optix_ray_tracer_tpu.render.film import Film, U8Frame
    from optix_ray_tracer_tpu.utils.debug import DEBUG_MODE

    frontend = renderer_mesh if mode == "mesh" else renderer_time

    fused_ok = (data.update_fn is None and not DEBUG_MODE
                and data.file_count
                and (mode == "mesh"
                     or getattr(data, "library").num_shapes > 0)
                and spp % mesh.shape["sample"] == 0)
    if fused_ok:
        from optix_ray_tracer_tpu.models import fused
        fdfn = (fused.mesh_file_data if mode == "mesh"
                else fused.time_file_data)
        yield from fused.render_frames_fused(
            data, mode, fdfn, width, height, spp, max_frames, loop,
            fetch_guides=fetch_guides, quantize=quantize, mesh=mesh)
        return
    cfg = data.config
    ld = cfg.loop_data
    n_tile = mesh.shape["tile"]
    hp = -(-height // n_tile) * n_tile        # padded render height

    produced = 0
    lights = None
    intersector = None
    while True:
        for fi in range(data.file_count):
            n_frames = common.frame_count_for_file(
                data.durations[fi], ld.fps, ld.render_speed_ratio)
            for k in range(n_frames):
                scene = frontend.frame_scene(data, fi, k, n_frames)
                if produced == 0:
                    lights = common.collect_lights(cfg, scene,
                                                   data.materials)
                intersector = (common.rebuild_or_choose(intersector, scene)
                               if k == 0
                               else common.refit_or_choose(intersector,
                                                           scene))
                seed = cfg.seed + produced
                sampler = getattr(cfg, "sampler", "pcg")
                if cfg.integrator == "path":
                    img, alb, nrm = render_path_sharded(
                        scene, data.materials, lights, data.camera,
                        width, hp, spp, mesh, seed=seed,
                        background=cfg.background,
                        max_depth=cfg.max_depth, intersector=intersector,
                        env=data.env, textures=data.textures,
                        want_guides=True, sampler=sampler)
                else:
                    img, alb, nrm = render_sharded(
                        scene, data.materials, data.camera, width, hp,
                        spp, mesh, seed=seed, background=cfg.background,
                        max_depth=cfg.max_depth, intersector=intersector,
                        env=data.env, want_guides=True, sampler=sampler)
                img, alb, nrm = img[:height], alb[:height], nrm[:height]
                if cfg.denoise and common.resolve_denoiser(cfg) == "neural":
                    from optix_ray_tracer_tpu.render.neural_denoise import (
                        denoise_neural,
                    )
                    img = denoise_neural(img, alb, nrm)
                elif cfg.denoise:
                    from optix_ray_tracer_tpu.render.denoise import denoise
                    img = denoise(img, alb, nrm)
                film = Film.create(width, height).add(img, alb, nrm, spp)
                if quantize:
                    film = U8Frame(film.to_uint8(), spp)
                yield fi, k, film
                produced += 1
                if max_frames is not None and produced >= max_frames:
                    return
        if not loop:
            return
