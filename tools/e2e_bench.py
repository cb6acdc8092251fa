"""End-to-end config-4/5 throughput (VERDICT r3 #8) + NEE-wave width
sweep for the bundle engine.

Honest timing: host-fetch sync after each measured batch (compile
excluded, steady-state marginal spp/s like PERF.md round-2/3).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from optix_ray_tracer_tpu.models import benchmarks
from optix_ray_tracer_tpu.models.common import choose_intersector
from optix_ray_tracer_tpu.render.pathtracer import render_path
from optix_ray_tracer_tpu.utils.jitcache import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def run_config(num, spp_batch=1, reps=3, **kw):
    cfg = benchmarks.ALL_CONFIGS[num]()
    for k, v in kw.items():
        cfg[k] = v
    inter = choose_intersector(cfg["scene"])
    w, h = cfg["width"], cfg["height"]

    def render(seed):
        img, _, _ = render_path(
            cfg["scene"], cfg["materials"], cfg.get("lights"),
            cfg["camera"], width=w, height=h, spp=spp_batch, seed=seed,
            background=cfg["background"], max_depth=cfg["max_depth"],
            intersector=inter, env=cfg.get("env"),
            textures=cfg.get("textures"))
        return img

    jrender = jax.jit(render)
    sync(jrender(0))                     # compile + warm
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        img = jrender(r + 1)
        sync(img)
        best = min(best, time.perf_counter() - t0)
    spp_s = spp_batch / best
    print(f"config {num} ({cfg['name']}, {w}x{h}, depth "
          f"{cfg['max_depth']}): {best:.2f} s / {spp_batch} spp = "
          f"{spp_s:.3f} spp/s")
    return spp_s


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "45"
    if "4" in which:
        run_config(4)
    if "5" in which:
        run_config(5)
    if "5h" in which:
        run_config(5, width=960, height=544)
