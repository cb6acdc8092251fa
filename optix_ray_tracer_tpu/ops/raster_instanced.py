"""TLAS-pair raster binning — the schedule-driven engine at INSTANCE
granularity (VERDICT r3 #7).

The true two-level traversal (ops/instanced.py) is exact but pays the
block marcher's per-visit scalar picks at (instance, library-cluster)
pair granularity, where it loses the global Morton locality a flattened
build gets (measured 13x slower than flatten+march at the 500-instance
benchmark, PERF.md).  This module routes common-origin waves (camera
primaries, point-light shadows) through the same rasterization binning
as ops/raster.py, but bins TLAS pairs instead of clusters:

* each pair's WORLD AABB (already refit per frame by
  ops/instanced.refit_instanced — the updateIAS analog,
  /root/reference/src/Global/RendererImpl.cu:174-242) projects to a
  rect + depth interval via its 8 corners;
* ray blocks get the identical rect/depth treatment as the cluster path
  (shared helper ops/raster._block_rects);
* the kernel (ops/pallas/tile_raster.raster_instanced_call) streams
  each scheduled pair's OBJECT-space library cluster and transforms the
  ray block into instance space in-kernel — geometry memory stays
  O(library), per-frame state O(instances), and the depth-sorted
  early-out retires tiles after their nearest instances.

Exactness mirrors the cluster path: binning is conservative (margined
corner rects, behind-plane corners go full-plane), the Woop test is the
marcher's arithmetic, and schedule overflow returns ok=False so the
caller falls back to the exact instanced marcher.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from optix_ray_tracer_tpu.ops.raster import (
    _basis_from, _block_rects, _enumerate_sorted_pairs, _pad_wave, _proj,
    MODES,
)
from optix_ray_tracer_tpu.utils.vecmath import INF


def default_instanced_pc_max(n_blocks: int, n_pairs: int) -> int:
    """Schedule capacity heuristic: coherent blocks overlap few
    instances; overflow falls back to the marcher (a cost bound, not a
    correctness bound)."""
    from optix_ray_tracer_tpu.ops.pallas.tile_raster import SMEM_PC_CAP

    pc = 12 * n_blocks + 2 * n_pairs + 1024
    return min(((pc + 1023) // 1024) * 1024, SMEM_PC_CAP)


def _pair_rects(pair_min, pair_max, basis, persp: bool, point):
    """Project each TLAS pair's world AABB (8 corners) onto the plane.
    Returns (cx0, cx1, cy0, cy1, cz0, cz1, cfull); NaN boxes (invalid
    instances) produce NaN rects that never overlap."""
    Cp = pair_min.shape[0]
    lo = pair_min[:, None, :]
    hi = pair_max[:, None, :]
    sel = jnp.asarray(
        [[(k >> a) & 1 for a in range(3)] for k in range(8)],
        jnp.float32)[None, :, :]                       # (1, 8, 3)
    corners = lo * (1.0 - sel) + hi * sel              # (Cp, 8, 3)
    q = corners.reshape(-1, 3)
    if persp:
        q = q - jnp.asarray(point, jnp.float32)
    vx, vy, vw, vgood = _proj(q, basis, persp)
    vnan = jnp.isnan(vx)
    behind = jnp.logical_and(jnp.logical_not(vgood),
                             jnp.logical_not(vnan))
    vxm = jnp.where(vgood, vx, jnp.nan).reshape(Cp, 8)
    vym = jnp.where(vgood, vy, jnp.nan).reshape(Cp, 8)
    vzm = vw.reshape(Cp, 8)            # depth keeps behind-plane corners
    cx0 = jnp.nanmin(vxm, axis=1)
    cx1 = jnp.nanmax(vxm, axis=1)
    cy0 = jnp.nanmin(vym, axis=1)
    cy1 = jnp.nanmax(vym, axis=1)
    cz0 = jnp.nanmin(vzm, axis=1)
    cz1 = jnp.nanmax(vzm, axis=1)
    cfull = jnp.any(behind.reshape(Cp, 8), axis=1)
    # conservative margin dominating fp projection error (the cluster
    # path's rule, ops/raster._coarse_stage)
    mx = 1e-5 * (jnp.abs(cx0) + jnp.abs(cx1)) + 1e-6
    my = 1e-5 * (jnp.abs(cy0) + jnp.abs(cy1)) + 1e-6
    mz = 1e-5 * (jnp.abs(cz0) + jnp.abs(cz1)) + 1e-6
    return (cx0 - mx, cx1 + mx, cy0 - my, cy1 + my, cz0 - mz, cz1 + mz,
            cfull)


def instanced_coarse_stage(pair_min, pair_max, o, d, t_min, t_max,
                           mode: str, point, W: int, pc_max: int) -> dict:
    """Pair-granularity analog of ops/raster._coarse_stage: TLAS pair
    rects from world AABB corners, shared block rects, depth-sorted
    (block, pair) enumeration."""
    if mode not in MODES:
        raise ValueError(f"mode {mode!r} not in {MODES}")
    Cp = pair_min.shape[0]
    n = o.shape[0]
    nb = -(-n // W)
    o_p, d_p, tmin_p, tmax_p = _pad_wave(o, d, t_min, t_max, n, nb, W)

    persp = mode != "ortho"
    if persp:
        # shard-invariant basis from the REPLICATED pair geometry
        # (finite pair centers' centroid), as in the cluster path
        c = (pair_min + pair_max) * 0.5 - jnp.asarray(point, jnp.float32)
        cmask = jnp.isnan(c[:, 0])
        csum = jnp.sum(jnp.where(cmask[:, None], 0.0, c), axis=0)
        ccnt = jnp.maximum(jnp.sum(~cmask), 1).astype(jnp.float32)
        wvec = csum / ccnt
        wvec = jnp.where(jnp.linalg.norm(wvec) > 1e-12, wvec,
                         jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
    else:
        wvec = d[0]
    basis = _basis_from(wvec)

    cx0, cx1, cy0, cy1, cz0, cz1, cfull = _pair_rects(
        pair_min, pair_max, basis, persp, point)
    bx0, bx1, by0, by1, bz0, bz1, live_any = _block_rects(
        o_p, d_p, tmin_p, tmax_p, nb, W, basis, mode, point)

    ov = ((bx0[:, None] <= cx1[None, :]) & (bx1[:, None] >= cx0[None, :])
          & (by0[:, None] <= cy1[None, :]) & (by1[:, None] >= cy0[None, :]))
    ovz = ((bz0[:, None] <= cz1[None, :]) & (bz1[:, None] >= cz0[None, :]))
    ov = (jnp.logical_or(ov, cfull[None, :]) & ovz & live_any[:, None])
    b_s, c_s, v_s, pc_total, cnt_b = _enumerate_sorted_pairs(
        ov, cz0, nb, Cp, pc_max)
    return dict(n=n, nb=nb, o_p=o_p, d_p=d_p, tmin_p=tmin_p,
                tmax_p=tmax_p, b_i=b_s, c_i=c_s,
                validc=v_s, pc_total=pc_total, cnt_b=cnt_b)


def instanced_raster_query(intersector, o, d, t_min, t_max,
                           mode: str = "origin", point=None,
                           any_hit: bool = False, block_rays: int = 1024,
                           pc_max: int | None = None):
    """Nearest-hit (or occlusion) TLAS query for a common-origin/
    -direction wave via pair binning + the instanced pair kernel.

    ``intersector`` is an ops/instanced.InstancedMarchIntersector (its
    refit pair state is the binning input).  Rays in CALLER order,
    blocks are consecutive ``block_rays`` runs (screen-tile layout).
    Returns (t, slot, u, v, ok): slot = TLAS pair * CLUSTER_TRIS + row
    (-1 = miss, the instanced marcher's slot convention); ok=False on
    schedule overflow — fall back to the exact marcher."""
    from optix_ray_tracer_tpu.ops.pallas.block_march import CLUSTER_TRIS
    from optix_ray_tracer_tpu.ops.pallas.tile_raster import (
        raster_instanced_call,
    )
    from optix_ray_tracer_tpu.ops.sweep import SUBS_PER_CLUSTER

    W = block_rays
    Cp = intersector.pair_min.shape[0]
    n = o.shape[0]
    nb = -(-n // W)
    from optix_ray_tracer_tpu.ops.pallas.tile_raster import SMEM_PC_CAP
    pc_max = min(pc_max or default_instanced_pc_max(nb, Cp), SMEM_PC_CAP)
    S = instanced_coarse_stage(
        intersector.pair_min, intersector.pair_max, o, d, t_min, t_max,
        mode, point, W, pc_max)

    b_i, c_i, validc = S["b_i"], S["c_i"], S["validc"]
    pc_total, cnt_b = S["pc_total"], S["cnt_b"]
    pair_tiles = jnp.where(validc, b_i, nb).astype(jnp.int32)
    pair_ids = jnp.where(validc, c_i, 0).astype(jnp.int32)
    pair_libs = intersector.pair_shape[pair_ids].astype(jnp.int32)
    pair_insts = intersector.pair_inst[pair_ids].astype(jnp.int32)

    sm = intersector.sub_min.reshape(Cp, SUBS_PER_CLUSTER, 3)
    sx = intersector.sub_max.reshape(Cp, SUBS_PER_CLUSTER, 3)
    rows = jnp.concatenate(
        [sm, sx, jnp.zeros((Cp, SUBS_PER_CLUSTER, 2), jnp.float32)],
        axis=2)
    sub8 = jnp.concatenate(
        [rows, jnp.full((Cp, 8 - SUBS_PER_CLUSTER, 8), jnp.nan,
                        jnp.float32)], axis=1)

    rays_t_ext = jnp.concatenate(
        [S["o_p"].T, S["d_p"].T, S["tmin_p"][None, :],
         S["tmax_p"][None, :]], axis=0)
    common = {"origin": "origin", "ortho": "dir", "target": None}[mode]
    out = raster_instanced_call(
        pair_tiles, pair_libs, pair_ids, pair_insts, rays_t_ext, sub8,
        intersector.inst_rows, intersector.library.woop_t, n_blocks=nb,
        w=W, any_hit=any_hit, cluster_tris=CLUSTER_TRIS,
        n_subs=SUBS_PER_CLUSTER, common=common)
    res = jnp.swapaxes(out[:nb, 0:4, :], 1, 2).reshape(nb * W, 4)[:n]
    touched = jnp.repeat(cnt_b > 0, W, total_repeat_length=nb * W)[:n]
    t = res[:, 0]
    slotf = res[:, 1]
    miss = jnp.logical_or(slotf < 0.0, jnp.logical_not(touched))
    slot = jnp.where(miss, -1, jnp.maximum(slotf, 0.0).astype(jnp.int32))
    t = jnp.where(miss, INF, t)
    ok = pc_total <= pc_max
    u = jnp.where(miss, 0.0, res[:, 2])
    v = jnp.where(miss, 0.0, res[:, 3])
    return t, slot, u, v, ok
