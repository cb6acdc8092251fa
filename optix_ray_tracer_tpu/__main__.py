"""Application entry point — the ``main()`` analog (``src/Global/Main.cu``).

Usage:
    python -m optix_ray_tracer_tpu --config path/to/config.json \
        [--frames N] [--output DIR] [--spp N] [--width W --height H]

Dispatch mirrors Main.cu:12-47: parse config; ``"cache": true`` bakes the
mesh cache and exits; otherwise commit the Mesh- or Time-mode scene, run the
render loop, and write one PNG per frame (the headless replacement for the
SDL swapchain).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="optix_ray_tracer_tpu")
    ap.add_argument("--config", required=True,
                    help="config.json (reference-compatible schema)")
    ap.add_argument("--frames", type=int, default=None,
                    help="max frames to render (default: one series pass)")
    ap.add_argument("--output", default=None, help="output directory")
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--loop", action="store_true",
                    help="cycle the animation like the interactive renderer")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from optix_ray_tracer_tpu.io.config import ConfigError, load_config
    from optix_ray_tracer_tpu.utils.logging import LOG, configure

    configure(verbose=args.verbose)
    try:
        config = load_config(args.config)
    except ConfigError as e:
        LOG.error("config error: %s", e)
        return 2

    if config.mesh and config.cache:
        # "cache": true bakes and exits (Main.cu:23-25)
        from optix_ray_tracer_tpu.models import renderer_mesh
        meta = renderer_mesh.write_cache_files(config)
        LOG.info("cache bake complete: %s", meta)
        return 0

    out_dir = args.output or config.resolve(config.output_dir)
    os.makedirs(out_dir, exist_ok=True)

    if config.mesh:
        from optix_ray_tracer_tpu.models import renderer_mesh as frontend
    else:
        from optix_ray_tracer_tpu.models import renderer_time as frontend

    t0 = time.time()
    data = frontend.commit(config)
    LOG.info("scene committed in %.1fs", time.time() - t0)

    n = 0
    for fi, k, film in frontend.render_frames(
            data, width=args.width, height=args.height, spp=args.spp,
            max_frames=args.frames, loop=args.loop):
        path = os.path.join(out_dir, f"frame_{n:06d}.png")
        film.save(path)
        LOG.info("file %d frame %d -> %s (spp=%d)", fi, k, path, int(film.spp))
        n += 1
    LOG.info("render finished: %d frames in %.1fs", n, time.time() - t0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
