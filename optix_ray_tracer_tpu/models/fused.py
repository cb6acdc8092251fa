"""Fused animation segments — refit + render + denoise for a CHUNK of
frames in ONE XLA dispatch.

Round-1 perf finding (PERF.md): this runtime has a ~6 ms dispatch+sync
floor, and the per-frame loop in the frontends paid it several times per
frame (transform, refit, render, denoise, fetch).  The reference instead
keeps its whole hot loop on one CUDA stream (RendererMesh.cu:315-454).
The TPU-native equivalent is to put the per-frame work inside a
``lax.scan`` over the frame index: instance transforms, cluster refit
(the updateIAS analog, RendererImpl.cu:210-242), the integrator, and the
denoiser (RendererImpl.cu:680-734) all trace into one program; frames
leave the device as one stacked fetch per chunk.

Both frontends route through ``fused_chunk`` whenever no host-side
per-frame hook is installed (``update_fn``) and debug-mode validation is
off; otherwise they fall back to the per-frame path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from optix_ray_tracer_tpu.scene.geometry import Scene, Triangles

# target device bytes for one chunk's stacked output buffers
_CHUNK_BYTES = 192 * 1024 * 1024


def chunk_size(width: int, height: int, n_frames: int,
               bytes_per_pixel: int = 36) -> int:
    """Frames per fused dispatch: the largest DIVISOR of ``n_frames``
    within the memory cap (``bytes_per_pixel`` of stacked output per
    frame: 36 = 3 float32 RGB buffers, 4 = one quantized uint8 RGBA).

    Divisors keep every chunk of a file the same shape — a shrinking
    tail chunk would trigger a second multi-minute XLA compile of the
    whole fused scan, and a clamped (padded) tail would re-render frames
    at ~100x the cost of the dispatch overhead fusion saves."""
    per_frame = width * height * bytes_per_pixel
    cap = max(1, min(16, _CHUNK_BYTES // max(per_frame, 1)))
    best = 1
    for c in range(1, cap + 1):
        if n_frames % c == 0:
            best = c
    return best


def _mesh_scene(fd, k, extra_spheres, extra_triangles, has_extras: bool):
    from optix_ray_tracer_tpu.models.renderer_mesh import _frame_world

    shift_scale = fd["duration"] * k * fd["inv_frame_count"]
    world_v, normals, mat = _frame_world(
        fd["vertices"], fd["normals"], fd["tri_particle"], fd["tri_valid"],
        fd["velocities"], fd["particle_mat"], shift_scale,
        fd["particle_shift"], fd["particle_scale"])
    tris = Triangles(world_v, normals, mat)
    if has_extras:
        tris = tris.concat(extra_triangles)
    return Scene(spheres=extra_spheres, triangles=tris)


def _time_scene(fd, k, extra_spheres, extra_triangles, has_extras: bool,
                euler_path: bool):
    from optix_ray_tracer_tpu.models.renderer_time import _frame_triangles

    v, n, mat = _frame_triangles(
        fd["lib_vertices"], fd["lib_normals"],
        fd["tri_lib_idx"], fd["tri_inst"], fd["tri_ok"],
        fd["positions"], fd["quats"], fd["quats_next"],
        fd["velocities"], fd["particle_mat"],
        fd["duration"], k, fd["inv_frames_minus1"], fd["inv_frame_count"],
        fd["particle_shift"], fd["particle_scale"],
        euler_path=euler_path)
    tris = Triangles(v, n, mat)
    if has_extras:
        tris = tris.concat(extra_triangles)
    return Scene(spheres=extra_spheres, triangles=tris)


@partial(jax.jit, static_argnames=(
    "mode", "width", "height", "spp", "integrator", "do_denoise",
    "max_depth", "use_march", "has_extras", "euler_path", "quantize",
    "want_guides", "temporal"))
def fused_chunk(fd, ks, seeds, base_inter, materials, camera,
                extra_spheres, extra_triangles, env, textures, lights,
                background, tstate=None, *, mode: str, width: int,
                height: int,
                spp: int, integrator: str, do_denoise: bool,
                max_depth: int, use_march: bool, has_extras: bool,
                euler_path: bool = False, quantize: bool = False,
                want_guides: bool = True, temporal: bool = False):
    """Render frames ``ks`` (float32 frame indices) of one animation file
    in a single dispatch.

    Returns a tuple of stacked outputs: the image stack — (len(ks), H, W,
    3) float32 linear, or with ``quantize`` (len(ks), H, W, 4) sRGB uint8
    quantized ON DEVICE (the reference's float4->uchar4 kernel,
    RendererImpl.cu:672-678) — followed, when ``want_guides``, by the
    (len(ks), H, W, 3) albedo and normal guide stacks.  Dropping the
    guides (the animation default: the in-loop denoiser consumes them on
    device) keeps them out of the chunk's output memory budget entirely.

    ``fd`` is the per-file data dict (equal shapes across files, so one
    compile serves the whole series).

    ``temporal`` (whitted integrator only; camera must be constant over
    the chunk): SVGF temporal reprojection across frames using the
    exactly-known per-instance rigid motion — ``tstate`` is the carried
    history (render/temporal.py ``empty_state``), and the return becomes
    ``(outs, final_tstate)`` so history flows across chunks and files."""
    from optix_ray_tracer_tpu.ops.march import refit_march_intersector
    from optix_ray_tracer_tpu.render import pathtracer, wavefront

    if temporal and integrator == "path":
        raise ValueError("temporal reprojection requires the whitted "
                         "integrator (aux buffers)")

    def step(carry, xs):
        k, seed = xs
        if mode == "mesh":
            scene = _mesh_scene(fd, k, extra_spheres, extra_triangles,
                                has_extras)
        else:
            scene = _time_scene(fd, k, extra_spheres, extra_triangles,
                                has_extras, euler_path)
        # the updateIAS-refit analog, on device, inside the scan
        inter = (refit_march_intersector(base_inter, scene)
                 if use_march else None)
        # NOTE: call the UNJITTED implementations (__wrapped__): first-
        # tracing a public jitted entry inside this scan poisons its
        # top-level dispatch cache on this jax version ("Execution
        # supplied 18 buffers but compiled program expected 20")
        if integrator == "path":
            img, alb, nrm = pathtracer.render_path.__wrapped__(
                scene, materials, lights, camera, width=width,
                height=height, spp=spp, seed=seed, background=background,
                max_depth=max_depth, intersector=inter, env=env,
                textures=textures)
        elif temporal:
            from optix_ray_tracer_tpu.render import temporal as tmod
            from optix_ray_tracer_tpu.utils.vecmath import INF, normalize

            img, alb, nrm, (t_g, prim_g) = wavefront.render.__wrapped__(
                scene, materials, camera, width, height, spp=spp,
                seed=seed, background=background, max_depth=max_depth,
                intersector=inter, env=env, want_aux=True)
            # hit world points via pixel-center rays (sub-pixel jitter
            # mismatch is far inside the validity tolerances)
            o_c, d_c = camera.generate_rays(width, height)
            hit_ok = (t_g < INF)[..., None]
            x = jnp.where(hit_ok, o_c + t_g[..., None] * d_c, o_c + d_c)
            if mode == "mesh":
                from optix_ray_tracer_tpu.models.renderer_mesh import (
                    prev_world_points,
                )
                x_prev = prev_world_points(fd, k, x, prim_g)
            else:
                from optix_ray_tracer_tpu.models.renderer_time import (
                    prev_world_points,
                )
                x_prev = prev_world_points(fd, k, x, prim_g,
                                           euler_path=euler_path)
            px, py, in_front = tmod.project_to_pixels(
                camera, x_prev, width, height)
            prev_t = jnp.linalg.norm(x_prev - camera.center, axis=-1)
            safe_alb = jnp.maximum(alb, 1e-3)
            nrm_u = normalize(nrm)
            blended, carry = tmod.temporal_blend(
                carry, img / safe_alb, t_g, nrm_u, px, py, prev_t,
                in_front)
            if do_denoise:
                from optix_ray_tracer_tpu.render.denoise import (
                    filter_irradiance,
                )
                # history-adaptive edge-stopping: converged pixels filter
                # tighter (see filter_irradiance docstring)
                sig = 1.0 / jnp.sqrt(jnp.maximum(carry["hist"], 1.0))
                img = filter_irradiance(blended, nrm,
                                        sigma_color=sig) * safe_alb
            else:
                img = blended * safe_alb
        else:
            img, alb, nrm = wavefront.render.__wrapped__(
                scene, materials, camera, width, height, spp=spp,
                seed=seed, background=background, max_depth=max_depth,
                intersector=inter, env=env)
        if do_denoise and not temporal:
            from optix_ray_tracer_tpu.render.denoise import denoise
            img = denoise.__wrapped__(img, alb, nrm)
        if quantize:
            from optix_ray_tracer_tpu.utils.color import color_to_uint8
            img = color_to_uint8(img)
        return carry, (img, alb, nrm) if want_guides else (img,)

    if temporal:
        from optix_ray_tracer_tpu.render import temporal as tmod

        init = tstate if tstate is not None \
            else tmod.empty_state(width, height)
        final, out = jax.lax.scan(step, init, (ks, seeds))
        return out, final
    _, out = jax.lax.scan(step, None, (ks, seeds))
    return out


def render_frames_fused(data, mode: str, file_data_fn, width: int,
                        height: int, spp: int, max_frames, loop: bool,
                        fetch_guides: bool = False,
                        quantize: bool = False):
    """Shared fused render loop for both frontends: yields
    (file_index, frame_index, Film) — or (…, U8Frame) with ``quantize``.

    ``file_data_fn(data, fi, n_frames) -> fd dict`` supplies the per-file
    arrays consumed by the scene builders above.

    Transfer policy (the tunnel D2H path runs ~35 MB/s — measured to cost
    2x the COMPUTE of a 1200x800 chunk): chunks are software-pipelined
    (chunk k+1 is dispatched before chunk k is fetched, overlapping
    device compute with the host transfer); with ``quantize`` frames are
    sRGB-quantized to uint8 ON DEVICE and fetched at 4 B/pixel; and the
    albedo/normal guide buffers are only computed as chunk outputs and
    fetched when ``fetch_guides`` is set — the in-loop denoiser already
    consumed them ON DEVICE (fused_chunk).  Without ``fetch_guides`` the
    yielded Films carry ZERO guide channels (documented API contract;
    the per-frame fallback in the frontends always carries real guides).
    """
    import numpy as np

    from optix_ray_tracer_tpu.models import common
    from optix_ray_tracer_tpu.ops.march import MarchIntersector
    from optix_ray_tracer_tpu.render.film import Film, U8Frame

    if quantize and fetch_guides:
        raise ValueError("quantize yields U8Frames, which carry no guide "
                         "channels — use fetch_guides with quantize=False")
    cfg = data.config
    ld = cfg.loop_data
    bg = jnp.asarray(cfg.background, jnp.float32)
    # SVGF temporal reprojection (render/temporal.py): fused-path only —
    # history rides the scan carry across frames, chunks, and files
    use_temporal = bool(getattr(cfg, "temporal", True)
                        and cfg.integrator != "path")
    state = {"lights": None, "base": None, "tstate": None}
    if use_temporal:
        from optix_ray_tracer_tpu.render import temporal as tmod
        state["tstate"] = tmod.empty_state(width, height)

    def dispatch_chunks():
        """Dispatch fused chunks asynchronously; yields
        (fi, k0, chunk, device outputs)."""
        planned = 0
        while True:
            for fi in range(data.file_count):
                n_frames = common.frame_count_for_file(
                    data.durations[fi], ld.fps, ld.render_speed_ratio)
                # per-file build (buildGAS analog, RendererMesh.cu:93-167):
                # host cluster build ONCE for the series' padded shapes,
                # then a DEVICE-side rebuild (fresh Morton order + refit,
                # jitted) per file — short files otherwise drown in host
                # build + D2H/H2D costs; refit happens in-scan per frame
                from optix_ray_tracer_tpu.models import (
                    renderer_mesh, renderer_time,
                )
                frontend = renderer_mesh if mode == "mesh" else renderer_time
                scene0 = frontend.frame_scene(data, fi, 0, n_frames)
                if state["lights"] is None:
                    state["lights"] = common.collect_lights(
                        cfg, scene0, data.materials)
                # rebuild_or_choose degrades to a fresh build if a frontend
                # ever yields per-file scenes with differing padded counts
                state["base"] = common.rebuild_or_choose(
                    state["base"], scene0)
                use_march = isinstance(state["base"], MarchIntersector)
                fd = file_data_fn(data, fi, n_frames)
                bpp = (4 if quantize else 12) + (24 if fetch_guides else 0)
                chunk = chunk_size(width, height, n_frames, bpp)
                for k0 in range(0, n_frames, chunk):
                    ks = jnp.arange(k0, k0 + chunk, dtype=jnp.float32)
                    seeds = jnp.arange(
                        cfg.seed + planned, cfg.seed + planned + chunk,
                        dtype=jnp.int32)
                    out = fused_chunk(
                        fd, ks, seeds, state["base"], data.materials,
                        data.camera, data.extra_spheres,
                        data.extra_triangles, data.env, data.textures,
                        state["lights"], bg, state["tstate"],
                        mode=mode, width=width, height=height, spp=spp,
                        integrator=cfg.integrator, do_denoise=cfg.denoise,
                        max_depth=cfg.max_depth, use_march=use_march,
                        has_extras=bool(data.extra_triangles.count),
                        euler_path=getattr(data, "reference_euler_path",
                                           False),
                        quantize=quantize, want_guides=fetch_guides,
                        temporal=use_temporal)
                    if use_temporal:
                        out, state["tstate"] = out
                    yield fi, k0, chunk, out
                    planned += chunk
                    if max_frames is not None and planned >= max_frames:
                        return
            if not loop:
                return

    produced = 0

    def emit(item):
        nonlocal produced
        fi, k0, chunk, out = item
        imgs = np.asarray(out[0])
        if fetch_guides:
            albs = np.asarray(out[1])
            nrms = np.asarray(out[2])
        else:
            albs = nrms = None
        for j in range(chunk):
            if quantize:
                frame = U8Frame(imgs[j], spp)
            else:
                z = np.zeros_like(imgs[j])
                frame = Film.create(width, height).add(
                    imgs[j],
                    albs[j] if albs is not None else z,
                    nrms[j] if nrms is not None else z, spp)
            yield fi, k0 + j, frame
            produced += 1
            if max_frames is not None and produced >= max_frames:
                return

    prev = None
    for item in dispatch_chunks():
        if prev is not None:
            yield from emit(prev)
            if max_frames is not None and produced >= max_frames:
                return
        prev = item
    if prev is not None:
        yield from emit(prev)


def mesh_file_data(data, fi: int, n_frames: int) -> dict:
    cfg = data.config.loop_data
    return dict(
        vertices=data.vertices[fi], normals=data.normals[fi],
        tri_particle=data.tri_particle[fi], tri_valid=data.tri_valid[fi],
        velocities=data.velocities[fi], particle_mat=data.particle_mat[fi],
        duration=jnp.float32(data.durations[fi]),
        inv_frame_count=jnp.float32(1.0 / max(n_frames, 1)),
        particle_shift=jnp.asarray(cfg.particle_shift, jnp.float32),
        particle_scale=jnp.asarray(cfg.particle_scale, jnp.float32))


def time_file_data(data, fi: int, n_frames: int) -> dict:
    cfg = data.config.loop_data
    nxt = min(fi + 1, data.file_count - 1)
    return dict(
        lib_vertices=data.library.vertices, lib_normals=data.library.normals,
        tri_lib_idx=data.tri_lib_idx[fi], tri_inst=data.tri_inst[fi],
        tri_ok=data.tri_ok[fi],
        positions=data.positions[fi], quats=data.quats[fi],
        quats_next=data.quats[nxt], velocities=data.velocities[fi],
        particle_mat=data.particle_mat[fi],
        duration=jnp.float32(data.durations[fi]),
        inv_frames_minus1=jnp.float32(1.0 / max(n_frames - 1, 1)),
        inv_frame_count=jnp.float32(1.0 / max(n_frames, 1)),
        particle_shift=jnp.asarray(cfg.particle_shift, jnp.float32),
        particle_scale=jnp.asarray(cfg.particle_scale, jnp.float32))
