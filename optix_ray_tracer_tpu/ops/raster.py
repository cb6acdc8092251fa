"""Perspective/orthographic binning for common-origin waves — the
scheduler side of the tile-raster engine (kernel:
ops/pallas/tile_raster.py).

Applicability.  A wave qualifies when every ray passes through one common
POINT (camera primary rays; shadow rays toward a point light — the point
may be the origin or the target) or shares one common DIRECTION (sun /
directional-light shadow rays).  Such rays map to single points on a
projection plane, so (ray block, cluster) candidate pairs can be
computed by 2-D rectangle + depth-interval overlap — classic
rasterization binning — instead of marching per block.  The reference's
analog workload is its per-pixel primary dispatch
(/root/reference/shader/Shader.cu:246-273); hardware BVH traversal is
replaced not by a software tree walk but by binning + dense streaming,
which maps to the TPU's strengths (static schedules, MXU work) instead
of its weakness (dynamic memory access).

Why this beats the block marcher on its own waves (measured on-chip,
100k-tri bench, PERF.md round-3 "tile raster"): the marcher pays two
scalar-reduction picks and a manual DMA issue per cluster visit
(~2.4 us) and needs a 16 ms coherence sort; the raster schedule is
computed once in XLA (no ray sort — the caller's screen-tile layout IS
the schedule), depth-sorted so near clusters come first, and the kernel
is a plain Mosaic-pipelined grid with zero picks whose per-pair depth
early-out retires tiles as soon as every ray's best-t excludes the
remaining (depth-sorted) clusters.

Exactness.  Binning only decides WHICH pairs the kernel tests; the test
is the marcher's Woop arithmetic, bit-identical.  Binning is
conservative:

* cluster rects are fp bounding boxes of the projected vertices,
  expanded by a relative margin that dominates fp projection error;
* a vertex on or behind the projection plane (w <= 0) makes its cluster
  FULL-PLANE — rect-tested against every live block (depth still
  applies, and keeps behind-plane vertex depths);
* a ray whose direction points away from the plane (w <= 0) projects
  nowhere, but can also only hit full-plane clusters, so it is simply
  excluded from its block's rect;
* blocks overlap nothing only when all their rays are dead
  (t_max <= t_min).

Static shapes.  Pair counts are data-dependent, so the pipeline runs
with a static capacity (``pc_max``, defaulted from scene/wave size) and
returns an ``ok`` scalar — False means overflow and the results are NOT
exact.  ops/march.py's ``intersect_from`` wraps the query with a
lax.cond fallback to the block marcher, so the production path stays
exact at any pair count.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from optix_ray_tracer_tpu.ops.pallas.tile_raster import GROUP_TRIS
from optix_ray_tracer_tpu.ops.sweep import CHUNK, ClusterSet
from optix_ray_tracer_tpu.utils.vecmath import INF

GROUPS_PER_CLUSTER = CHUNK // GROUP_TRIS

#: projection modes: rays share an origin point / a target point / a
#: direction (orthographic)
MODES = ("origin", "target", "ortho")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RasterSet:
    """Per-scene raster tables, derived from a ClusterSet.

    verts: (n_pad, 3, 3) sorted triangle vertices, NaN where padded —
    the binning projects these per wave (cheap: one matmul + reductions
    over 3*n_pad rows).
    """
    verts: jax.Array

    @property
    def num_groups(self) -> int:
        return self.verts.shape[0] // GROUP_TRIS


def build_raster_set(clusters: ClusterSet, tri_vertices) -> RasterSet:
    """Jittable: derives the raster tables from a (re)built/refit
    ClusterSet and the ORIGINAL triangle vertex array (n, 3, 3)."""
    n_pad = clusters.woop.shape[0]
    tv = jnp.asarray(tri_vertices, jnp.float32).reshape(-1, 3, 3)
    n = tv.shape[0]
    if n == 0:
        sv = jnp.full((n_pad, 3, 3), jnp.nan, jnp.float32)
    else:
        sv = tv[jnp.minimum(clusters.prim_index, n - 1)]
        live = (jnp.arange(n_pad) < n)[:, None, None]
        sv = jnp.where(live, sv, jnp.nan)
    return RasterSet(verts=sv)


def _basis_from(wvec):
    """Right-handed orthonormal (u, v, w) with w along ``wvec``."""
    w = wvec / jnp.maximum(jnp.linalg.norm(wvec), 1e-12)
    a = jnp.where(jnp.abs(w[0]) < 0.9,
                  jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                  jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
    u = jnp.cross(w, a)
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
    v = jnp.cross(w, u)
    return u, v, w


def _proj(q, basis, persp: bool):
    """Project rows of q; returns (x, y, w, good).  NaN rows stay NaN
    and read good=False; behind-plane rows (w <= 0) read good=False with
    finite garbage coords (callers mask on good).  w is the depth
    coordinate (along the basis w axis; raw rows for ortho mode)."""
    u, v, w = basis
    qu = q @ u
    qv = q @ v
    qw = q @ w
    if not persp:
        return qu, qv, qw, jnp.logical_not(jnp.isnan(qu))
    good = qw > 0.0
    den = jnp.where(good, qw, 1.0)
    return qu / den, qv / den, qw, good


def default_pc_max(n_blocks: int, n_clusters: int,
                   granularity: int = 1) -> int:
    """Coarse-pair capacity heuristic — sized for coherent waves (blocks
    overlap ~a few clusters); overflow falls back to the marcher, so
    this bounds cost, not correctness.  Finer schedule granularity
    multiplies pair counts sub-linearly (finer boxes pair with fewer
    tiles); budget ~(1 + g)/2 of the cluster-granularity count."""
    from optix_ray_tracer_tpu.ops.pallas.tile_raster import SMEM_PC_CAP

    pc = 12 * n_blocks + 2 * n_clusters + 1024
    pc = pc * (1 + granularity) // 2
    return min(((pc + 1023) // 1024) * 1024, SMEM_PC_CAP)


def _rank_lookup(cum_rows, flat_dim: int, row_idx, rank):
    """Smallest column c with cum_rows[row, c] >= rank + 1, by bisection
    over the flattened inclusive row-cumsum matrix."""
    flat = cum_rows.reshape(-1)
    lo = jnp.zeros_like(row_idx)
    hi = jnp.full_like(row_idx, flat_dim - 1)
    for _ in range(max(1, (flat_dim - 1).bit_length())):
        mid = (lo + hi) // 2
        ge = flat[row_idx * flat_dim + mid] >= rank + 1
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    return hi


def _enumerate_sorted_pairs(ov, entry_depth, nb: int, C: int,
                            pc_max: int):
    """Shared pair machinery: enumerate the True cells of the (nb, C)
    overlap matrix ``ov`` into flat (block, cluster) pair lists capped at
    ``pc_max``, then stable-sort by (block, entry_depth[pair]) so the
    kernel sees each tile's clusters near-to-far.

    The sort keys are GLOBAL per cluster (exact float depth, cluster-id
    tiebreak via enumeration order) — a sharded row band of the wave
    produces the same per-tile order as the full wave, which is what
    makes sharded rendering bit-identical (see module docstring).

    Returns (b_i, c_i, validc, pc_total, cnt_b).
    """
    ovi = ov.astype(jnp.int32)
    cnt_b = jnp.sum(ovi, axis=1)
    cum_b = jnp.cumsum(cnt_b)
    pc_total = cum_b[-1]
    i = jnp.arange(pc_max, dtype=jnp.int32)
    b_i = jnp.minimum(
        jnp.searchsorted(cum_b, i, side="right"), nb - 1).astype(jnp.int32)
    validc = i < pc_total
    j = i - (cum_b[b_i] - cnt_b[b_i])
    c_i = _rank_lookup(jnp.cumsum(ovi, axis=1), C, b_i, j)
    key_tile = jnp.where(validc, b_i, nb).astype(jnp.int32)
    if entry_depth.ndim == 2:      # per-(block, cluster) entries
        ent = entry_depth.reshape(-1)[b_i * C + c_i]
    else:                          # per-cluster entries
        ent = entry_depth[c_i]
    key_depth = jnp.where(validc, ent, INF)
    _, _, b_s, c_s, v_s = jax.lax.sort(
        (key_tile, key_depth, b_i, c_i, validc),
        num_keys=2, is_stable=True)
    return b_s, c_s, v_s, pc_total, cnt_b


def _pad_wave(o, d, t_min, t_max, n: int, nb: int, W: int):
    """Pad a wave to nb*W rays plus one trailing dead block (the trash
    tile's fetch target); padded lanes are dead (t_max <= t_min)."""
    t_min_a = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max_a = jnp.minimum(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), INF)
    pad = nb * W - n
    o_p = jnp.pad(o, ((0, pad + W), (0, 0)))
    d_p = jnp.pad(d, ((0, pad + W), (0, 0)))
    d_p = d_p.at[n:, 2].set(1.0)
    tmin_p = jnp.pad(t_min_a, (0, pad + W), constant_values=1.0)
    tmax_p = jnp.pad(t_max_a, (0, pad + W), constant_values=0.0)
    return o_p, d_p, tmin_p, tmax_p


def _block_rects(o_p, d_p, tmin_p, tmax_p, nb: int, W: int, basis,
                 mode: str, point):
    """Per-block ray rects + depth ranges on the projection plane —
    shared between the per-cluster and the TLAS-pair coarse stages.
    Returns (bx0, bx1, by0, by1, bz0, bz1, live_any)."""
    persp = mode != "ortho"
    if persp:
        p = jnp.asarray(point, jnp.float32)
        q_rays = (d_p if mode == "origin" else o_p - p)[:nb * W]
    else:
        q_rays = o_p[:nb * W]
    rx, ry, rqw, rgood = _proj(q_rays, basis, persp)
    tmin_r = tmin_p[:nb * W]
    tmax_r = tmax_p[:nb * W]
    live = tmax_r > tmin_r
    pv = jnp.logical_and(rgood, live)
    pxm = jnp.where(pv, rx, jnp.nan).reshape(nb, W)
    pym = jnp.where(pv, ry, jnp.nan).reshape(nb, W)
    bx0 = jnp.nanmin(pxm, axis=1)
    bx1 = jnp.nanmax(pxm, axis=1)
    by0 = jnp.nanmin(pym, axis=1)
    by1 = jnp.nanmax(pym, axis=1)
    live_any = jnp.any(live.reshape(nb, W), axis=1)
    # depth along the ray is w0 + t * (d . w_basis), valid for EVERY ray
    # (no division) — segments only need geometry inside their depth
    # interval, which prunes whole-scene shadow binning to the slab
    # between origin patch and target (measured 2.9x fewer pairs on the
    # bench shadow wave; the far side of a closed mesh never pairs)
    if mode == "origin":
        wd = rqw                      # q_rays = d
        w0 = jnp.zeros_like(wd)
    else:
        wd = d_p[:nb * W] @ basis[2]
        w0 = rqw
    dlo = w0 + jnp.minimum(tmin_r * wd, tmax_r * wd)
    dhi = w0 + jnp.maximum(tmin_r * wd, tmax_r * wd)
    bz0 = jnp.min(jnp.where(live, dlo, INF).reshape(nb, W), axis=1)
    bz1 = jnp.max(jnp.where(live, dhi, -INF).reshape(nb, W), axis=1)
    return bx0, bx1, by0, by1, bz0, bz1, live_any


def _coarse_stage(rset: RasterSet, clusters: ClusterSet, o, d, t_min,
                  t_max, mode: str, point, W: int, pc_max: int,
                  granularity: int = 1) -> dict:
    """Projections, cluster/block rects with depth ranges, coarse
    (block, cluster) pair enumeration, per-block depth sort.

    ``granularity`` g > 1 bins at sub-cluster granularity: the schedule
    id becomes ``cluster * g + sub`` over CHUNK//g-triangle contiguous
    windows (finer projected rects + finer depth sort, the only
    identified path to cutting the kernel's tests/ray — VERDICT r4 #1).
    """
    if mode not in MODES:
        raise ValueError(f"mode {mode!r} not in {MODES}")
    C = clusters.num_clusters * granularity
    n_g = rset.num_groups
    n = o.shape[0]
    nb = -(-n // W)

    o_p, d_p, tmin_p, tmax_p = _pad_wave(o, d, t_min, t_max, n, nb, W)

    persp = mode != "ortho"
    if persp:
        p = jnp.asarray(point, jnp.float32)
        q_rays = (d_p if mode == "origin" else o_p - p)[:nb * W]
        q_verts = rset.verts.reshape(-1, 3) - p
        # Projection axis from the REPLICATED cluster geometry (shared
        # point -> vertex centroid), NOT from the wave's rays: a sharded
        # row band then bins with the same basis as the full frame, so
        # schedules — and fp-tie winners — are bit-identical at any
        # device count.  (The old mean-ray axis differed per shard and
        # flipped 1-ulp ties between sharded and single-device frames.)
        # Degenerate case (point at the centroid, e.g. camera inside a
        # symmetric mesh) falls back to a fixed axis — binning stays
        # conservative/exact, only pair counts suffer.
        vmask = jnp.isnan(q_verts[:, 0])
        vsum = jnp.sum(jnp.where(vmask[:, None], 0.0, q_verts), axis=0)
        vcnt = jnp.maximum(jnp.sum(~vmask), 1).astype(jnp.float32)
        wvec = vsum / vcnt
        wvec = jnp.where(jnp.linalg.norm(wvec) > 1e-12, wvec,
                         jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
    else:
        q_rays = o_p[:nb * W]
        wvec = d[0]   # ortho contract: every ray shares d, shard-safe
        q_verts = rset.verts.reshape(-1, 3)
    basis = _basis_from(wvec)

    # ---- cluster rects (x/y plane + depth range), via 8-tri groups ----
    vx, vy, vw, vgood = _proj(q_verts, basis, persp)
    vnan = jnp.isnan(vx)
    behind = jnp.logical_and(jnp.logical_not(vgood), jnp.logical_not(vnan))
    vxm = jnp.where(vgood, vx, jnp.nan).reshape(n_g, 3 * GROUP_TRIS)
    vym = jnp.where(vgood, vy, jnp.nan).reshape(n_g, 3 * GROUP_TRIS)
    vzm = vw.reshape(n_g, 3 * GROUP_TRIS)   # depth keeps behind verts
    gx0 = jnp.nanmin(vxm, axis=1)
    gx1 = jnp.nanmax(vxm, axis=1)
    gy0 = jnp.nanmin(vym, axis=1)
    gy1 = jnp.nanmax(vym, axis=1)
    gz0 = jnp.nanmin(vzm, axis=1)
    gz1 = jnp.nanmax(vzm, axis=1)
    gfull = jnp.any(behind.reshape(n_g, 3 * GROUP_TRIS), axis=1)
    # conservative margin: dominates fp projection error (rel ~1e-7)
    mx = 1e-5 * (jnp.abs(gx0) + jnp.abs(gx1)) + 1e-6
    my = 1e-5 * (jnp.abs(gy0) + jnp.abs(gy1)) + 1e-6
    mz = 1e-5 * (jnp.abs(gz0) + jnp.abs(gz1)) + 1e-6
    G = GROUPS_PER_CLUSTER // granularity
    cx0 = jnp.nanmin((gx0 - mx).reshape(C, G), axis=1)
    cx1 = jnp.nanmax((gx1 + mx).reshape(C, G), axis=1)
    cy0 = jnp.nanmin((gy0 - my).reshape(C, G), axis=1)
    cy1 = jnp.nanmax((gy1 + my).reshape(C, G), axis=1)
    cz0 = jnp.nanmin((gz0 - mz).reshape(C, G), axis=1)
    cz1 = jnp.nanmax((gz1 + mz).reshape(C, G), axis=1)
    cfull = jnp.any(gfull.reshape(C, G), axis=1)

    # ---- per-block ray rects + depth ranges ----
    bx0, bx1, by0, by1, bz0, bz1, live_any = _block_rects(
        o_p, d_p, tmin_p, tmax_p, nb, W, basis, mode, point)

    # ---- coarse (block, cluster) pairs, depth-sorted near-to-far ----
    # (the kernel's per-pair depth early-out then retires primary tiles
    # after the nearest clusters and occluded any_hit tiles after the
    # first occluder)
    ov = ((bx0[:, None] <= cx1[None, :]) & (bx1[:, None] >= cx0[None, :])
          & (by0[:, None] <= cy1[None, :]) & (by1[:, None] >= cy0[None, :]))
    ovz = ((bz0[:, None] <= cz1[None, :]) & (bz1[:, None] >= cz0[None, :]))
    ov = (jnp.logical_or(ov, cfull[None, :]) & ovz & live_any[:, None])
    b_s, c_s, v_s, pc_total, cnt_b = _enumerate_sorted_pairs(
        ov, cz0, nb, C, pc_max)
    return dict(n=n, nb=nb, o_p=o_p, d_p=d_p, tmin_p=tmin_p,
                tmax_p=tmax_p, b_i=b_s, c_i=c_s,
                validc=v_s, pc_total=pc_total, cnt_b=cnt_b)


def raster_query(rset: RasterSet, clusters: ClusterSet, o, d,
                 t_min, t_max, mode: str = "origin", point=None,
                 any_hit: bool = False, block_rays: int = 1024,
                 pc_max: int | None = None,
                 return_stats: bool = False,
                 granularity: int = 1):
    """Nearest-hit (or occlusion) query for a common-origin/-direction
    wave.  Rays are taken in CALLER ORDER — blocks are consecutive runs
    of ``block_rays`` rays, so the caller's layout should be screen- or
    hit-coherent (camera tile order qualifies; no sort pass is needed or
    performed; incoherent layouts stay EXACT but pair up with everything
    and overflow).

    o, d: (R, 3); t bounds scalars or (R,); mode: see MODES; ``point``
    is the shared point for origin/target modes (ortho uses d[0]).

    Returns (t, slot, u, v, ok): slot indexes the sorted prim arrays
    (-1 = miss), ok=False signals capacity overflow (results invalid —
    fall back to the marcher, see ops/march.py intersect_from).

    A NOTE ON GRANULARITY: an 8-triangle fine-binned variant (per-group
    pair refinement + per-frame Woop gather into chunk tables) was built
    and measured SLOWER on-chip despite 2.5x fewer triangle tests — the
    per-frame gather of gathered chunks ran at XLA's ~5 GB/s gather
    ceiling and ate the kernel win (PERF.md round-3 "tile raster").
    This cluster-granularity version streams whole 256-triangle clusters
    straight from the STATIC woop_t with Mosaic's pipeline instead.
    """
    W = block_rays
    C = clusters.num_clusters
    n = o.shape[0]
    nb = -(-n // W)
    from optix_ray_tracer_tpu.ops.pallas.tile_raster import SMEM_PC_CAP
    pc_max = min(pc_max or default_pc_max(nb, C, granularity),
                 SMEM_PC_CAP)
    S = _coarse_stage(rset, clusters, o, d, t_min, t_max, mode, point,
                      W, pc_max, granularity)
    # shared-point/-direction dots narrow to one lane column in the
    # kernel ("origin" rays all start at ``point``; "ortho" rays share
    # d) — 1/8 the MXU work on the shared side, 1-ulp winner ties may
    # resolve differently than the full-width dot (see
    # tile_raster._make_cluster_kernel).  "target" keeps full width
    # (origins vary; occlusion callers flip to "origin" upstream —
    # ops/march.py intersect_from).
    common = {"origin": "origin", "ortho": "dir", "target": None}[mode]
    return _run_pair_schedule(clusters, S, W, n, nb, any_hit, common,
                              pc_max, return_stats,
                              granularity=granularity)


def _run_pair_schedule(clusters: ClusterSet, S: dict, W: int, n: int,
                       nb: int, any_hit: bool, common: str | None,
                       pc_max: int, return_stats: bool = False,
                       granularity: int = 1):
    """Run the tile-raster kernel over an enumerated pair schedule
    (``S`` from :func:`_coarse_stage` or :func:`bundle_stage`) and
    unpack (t, slot, u, v, ok).  ``granularity`` must match the stage
    that produced ``S`` (pair ids are cluster*g + sub)."""
    from optix_ray_tracer_tpu.ops.pallas.tile_raster import (
        raster_cluster_call,
    )
    from optix_ray_tracer_tpu.ops.sweep import SUBS_PER_CLUSTER

    C = clusters.num_clusters
    g = granularity
    if SUBS_PER_CLUSTER % g != 0:
        raise ValueError(f"granularity {g} must divide SUBS_PER_CLUSTER "
                         f"({SUBS_PER_CLUSTER})")
    n_subs = SUBS_PER_CLUSTER // g
    b_i, c_i, validc = S["b_i"], S["c_i"], S["validc"]
    pc_total, cnt_b = S["pc_total"], S["cnt_b"]
    pair_tiles = jnp.where(validc, b_i, nb).astype(jnp.int32)
    pair_clusters = jnp.where(validc, c_i, 0).astype(jnp.int32)

    # per-PAIR gate rows: a granularity-g pair covers SUBS/g of the
    # existing sub boxes — a pure reshape of the build's box arrays
    sm = clusters.sub_min.reshape(C * g, n_subs, 3)
    sx = clusters.sub_max.reshape(C * g, n_subs, 3)
    rows = jnp.concatenate(
        [sm, sx, jnp.zeros((C * g, n_subs, 2), jnp.float32)], axis=2)
    sub8 = jnp.concatenate(
        [rows, jnp.full((C * g, 8 - n_subs, 8), jnp.nan,
                        jnp.float32)], axis=1)

    rays_t_ext = jnp.concatenate(
        [S["o_p"].T, S["d_p"].T, S["tmin_p"][None, :],
         S["tmax_p"][None, :]], axis=0)
    ct = clusters.woop_t.shape[2] // g
    if g == 1:
        woop_g = clusters.woop_t
    else:
        # pair-major layout: sub s of cluster c owns columns
        # [s*ct, (s+1)*ct) of the marcher's woop_t — a static transpose
        # (XLA copies ~tens of us at stream bandwidth), NOT a gather
        woop_g = (clusters.woop_t.reshape(C, 16, g, ct)
                  .transpose(0, 2, 1, 3).reshape(C * g, 16, ct))
    out = raster_cluster_call(pair_tiles, pair_clusters, rays_t_ext, sub8,
                              woop_g, n_blocks=nb, w=W,
                              any_hit=any_hit,
                              cluster_tris=ct,
                              n_subs=n_subs, common=common,
                              granularity=g)
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
    if return_stats:
        return t, slot, u, v, ok, {"pc": pc_total, "pc_max": pc_max}
    return t, slot, u, v, ok


#: back-compat alias (the cluster-granularity query IS the raster query)
raster_cluster_query = raster_query


def measure_pair_count(rset: RasterSet | None, clusters: ClusterSet,
                       o, d, t_min, t_max, mode: str = "origin",
                       point=None, block_rays: int = 1024,
                       granularity: int = 1) -> int:
    """One-shot schedule-capacity calibration: the EXACT pair count the
    binning would enumerate for this wave (``pc_total`` is computed from
    the full overlap matrix, independent of any enumeration cap).

    Callers measure a representative wave once, then pass
    ``pc_max = round_up(margin * count)`` to the query — replacing
    hand-swept per-scene constants (the capacity knob auto-tunes; an
    undersized cap still falls back to the exact marcher).
    ``rset=None`` measures the 3-D bundle binning instead of the
    projective binning."""
    n = o.shape[0]
    nb = -(-n // block_rays)
    if rset is None:
        S = bundle_stage(clusters, o, d, t_min, t_max, block_rays, 8,
                         granularity=granularity)
    else:
        S = _coarse_stage(rset, clusters, o, d, t_min, t_max, mode,
                          point, block_rays, 8, granularity)
    del nb
    return int(S["pc_total"])


def round_pc_max(count: int, margin: float = 1.15) -> int:
    """Static capacity from a measured pair count: margin + round up to
    the next 1024 (one compiled shape per capacity bucket).  Clamped to
    the SMEM-safe cap — a schedule that can't fit SMEM falls back to
    the marcher instead of failing to compile (round-4 fix: config-5's
    ~200k-pair bundle schedules blew the ~1 MB SMEM budget)."""
    from optix_ray_tracer_tpu.ops.pallas.tile_raster import SMEM_PC_CAP

    pc = int(count * margin) + 256
    return min(max(1024, ((pc + 1023) // 1024) * 1024), SMEM_PC_CAP)


def default_bundle_pc_max(n_blocks: int, n_clusters: int,
                          granularity: int = 1) -> int:
    """Bundle-pair capacity heuristic: secondary blocks overlap more
    clusters than common-origin blocks (hemispherical directions), so
    budget ~an order more pairs per block.  Overflow falls back to the
    marcher — a cost bound, not a correctness bound."""
    from optix_ray_tracer_tpu.ops.pallas.tile_raster import SMEM_PC_CAP

    pc = 96 * n_blocks + 2 * n_clusters * granularity + 1024
    pc = pc * (1 + granularity) // 2
    return min(((pc + 1023) // 1024) * 1024, SMEM_PC_CAP)


def bundle_stage(clusters: ClusterSet, o, d, t_min, t_max, W: int,
                 pc_max: int, dir_octants: bool = True,
                 granularity: int = 1) -> dict:
    """Conservative 3-D binning for ARBITRARY-ray waves (bounce rays,
    NEE shadow rays) that arrive in a spatially coherent layout (screen
    tiles: a tile's bounce origins are its primary-hit surface patch).

    Each W-ray block gets componentwise ORIGIN and DIRECTION interval
    bounds over its live rays (dead lanes, t_max <= t_min, drop out —
    dying waves shrink their blocks without any compaction pass).  A
    (block, cluster) pair survives when interval arithmetic admits some
    t >= 0 with  [olo + t*dlo, ohi + t*dhi]  overlapping the cluster's
    AABB on every axis, intersected with the block's [t_min, t_max]
    window.  All bounds are conservative (margined cluster boxes,
    relative-margined division results, |d| <= eps treated as
    always-satisfiable), so every (ray, cluster) true intersection is
    paired — the kernel's Woop test decides exactly, as in the 2-D
    raster path.  The conservative entry t of each pair depth-sorts the
    schedule, so the kernel's best-t early-out retires blocks near-first
    exactly like the common-origin path.

    This generalizes the reference's RT-core dispatch for secondary
    rays (/root/reference/shader/Shader.cu:229-241) the same way
    raster_query does for primaries: scheduling moves OUTSIDE the
    kernel into dense XLA math, the kernel stays a zero-pick pair
    stream.
    """
    from optix_ray_tracer_tpu.ops.sweep import SUBS_PER_CLUSTER

    # schedule ids at sub-cluster granularity (same contract as
    # _coarse_stage): C*g windows of SUBS/g consecutive sub boxes each
    C = clusters.num_clusters * granularity

    n = o.shape[0]
    nb = -(-n // W)
    t_min_a = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max_a = jnp.minimum(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), INF)
    pad = nb * W - n
    o_p = jnp.pad(o, ((0, pad + W), (0, 0)))
    d_p = jnp.pad(d, ((0, pad + W), (0, 0)))
    d_p = d_p.at[n:, 2].set(1.0)
    tmin_p = jnp.pad(t_min_a, (0, pad + W), constant_values=1.0)
    tmax_p = jnp.pad(t_max_a, (0, pad + W), constant_values=0.0)

    live_all = (tmax_p > tmin_p)[:nb * W].reshape(nb, W)
    ob = o_p[:nb * W].reshape(nb, W, 3)
    db = d_p[:nb * W].reshape(nb, W, 3)
    tmin_b = tmin_p[:nb * W].reshape(nb, W)
    tmax_b = tmax_p[:nb * W].reshape(nb, W)
    live_any = jnp.any(live_all, axis=1)

    # margined window AABBs from the sub boxes (whole clusters at g=1)
    sm = clusters.sub_min.reshape(C, SUBS_PER_CLUSTER // granularity, 3)
    sx = clusters.sub_max.reshape(C, SUBS_PER_CLUSTER // granularity, 3)
    clo = jnp.nanmin(sm, axis=1)
    chi = jnp.nanmax(sx, axis=1)
    m = 1e-5 * (jnp.abs(clo) + jnp.abs(chi)) + 1e-6
    clo = clo - m
    chi = chi + m

    def _overlap(live):
        """Interval-arithmetic (block, cluster) overlap for the lanes
        selected by ``live`` -> (ov (nb, C) bool, lo_eff (nb, C))."""
        lv = live[..., None]
        olo = jnp.min(jnp.where(lv, ob, INF), axis=1)      # (nb, 3)
        ohi = jnp.max(jnp.where(lv, ob, -INF), axis=1)
        dlo = jnp.min(jnp.where(lv, db, INF), axis=1)
        dhi = jnp.max(jnp.where(lv, db, -INF), axis=1)
        t_lo_b = jnp.min(jnp.where(live, tmin_b, INF), axis=1)
        t_hi_b = jnp.max(jnp.where(live, tmax_b, -INF), axis=1)

        eps = 1e-12
        lo_t = jnp.zeros((nb, C), jnp.float32)
        hi_t = jnp.full((nb, C), INF, jnp.float32)
        for ax in range(3):
            u = chi[None, :, ax] - olo[:, None, ax]  # want t*dlo <= u
            v = clo[None, :, ax] - ohi[:, None, ax]  # want t*dhi >= v
            dl = dlo[:, None, ax]
            dh = dhi[:, None, ax]
            # dl > eps: t <= u/dl; dl < -eps: t >= u/dl; |dl| <= eps:
            # conservative always-satisfied (|t*dl| stays ~0)
            hi1 = jnp.where(dl > eps, u / jnp.where(dl > eps, dl, 1.0),
                            INF)
            lo1 = jnp.where(dl < -eps,
                            u / jnp.where(dl < -eps, dl, 1.0), 0.0)
            hi2 = jnp.where(dh < -eps,
                            v / jnp.where(dh < -eps, dh, 1.0), INF)
            lo2 = jnp.where(dh > eps, v / jnp.where(dh > eps, dh, 1.0),
                            0.0)
            lo_t = jnp.maximum(lo_t, jnp.maximum(lo1, lo2))
            hi_t = jnp.minimum(hi_t, jnp.minimum(hi1, hi2))
        # relative margins swallow division rounding (cluster boxes are
        # already margined absolutely above)
        lo_t = lo_t - (jnp.abs(lo_t) * 1e-6 + 1e-8)
        hi_t = hi_t + (jnp.abs(hi_t) * 1e-6 + 1e-8)
        lo_eff = jnp.maximum(lo_t, t_lo_b[:, None])
        hi_eff = jnp.minimum(hi_t, t_hi_b[:, None])
        # NaN anywhere (padded clusters, dead blocks) compares False
        return lo_eff <= hi_eff, lo_eff

    if dir_octants:
        # per-OCTANT direction intervals, OR'd (VERDICT r4 #5): a
        # hemispherical block pairs with most of the scene because its
        # single direction interval straddles zero on every axis; the
        # same block split by direction sign octant gets 8 cone-bounded
        # interval tests whose UNION is strictly tighter.  Pure masked
        # reductions — no gather, no lane movement, no extra kernel
        # work (the pair set is deduplicated by construction: one
        # (block, cluster) pair however many octants admit it, keyed by
        # the most conservative admitted entry for the depth sort).
        # Exactness: every lane's octant contributes its own interval
        # test, so any true (ray, cluster) intersection is paired.
        oct_id = ((db[..., 0] > 0).astype(jnp.int32)
                  + 2 * (db[..., 1] > 0).astype(jnp.int32)
                  + 4 * (db[..., 2] > 0).astype(jnp.int32))
        ov = jnp.zeros((nb, C), bool)
        lo_key = jnp.full((nb, C), INF, jnp.float32)
        for q in range(8):
            ov_q, lo_q = _overlap(live_all & (oct_id == q))
            ov = jnp.logical_or(ov, ov_q)
            lo_key = jnp.minimum(lo_key, jnp.where(ov_q, lo_q, INF))
    else:
        ov, lo_key = _overlap(live_all)
    ov = ov & live_any[:, None]

    b_s, c_s, v_s, pc_total, cnt_b = _enumerate_sorted_pairs(
        ov, lo_key, nb, C, pc_max)
    return dict(n=n, nb=nb, o_p=o_p, d_p=d_p, tmin_p=tmin_p,
                tmax_p=tmax_p, b_i=b_s, c_i=c_s,
                validc=v_s, pc_total=pc_total, cnt_b=cnt_b)


def bundle_query(clusters: ClusterSet, o, d, t_min, t_max,
                 any_hit: bool = False, block_rays: int = 1024,
                 pc_max: int | None = None,
                 return_stats: bool = False,
                 dir_octants: bool = True,
                 granularity: int = 1):
    """Nearest-hit (or occlusion) query for an arbitrary-ray wave in a
    spatially coherent caller layout (screen tiles) via 3-D bundle
    binning + the zero-pick pair kernel (full-width Woop dots — no
    shared point to narrow on).

    Same contract as :func:`raster_query`: rays in caller order, blocks
    are consecutive runs of ``block_rays``; returns (t, slot, u, v, ok)
    with ok=False on schedule overflow (fall back to the marcher)."""
    W = block_rays
    C = clusters.num_clusters
    n = o.shape[0]
    nb = -(-n // W)
    from optix_ray_tracer_tpu.ops.pallas.tile_raster import SMEM_PC_CAP
    pc_max = min(pc_max or default_bundle_pc_max(nb, C, granularity),
                 SMEM_PC_CAP)
    S = bundle_stage(clusters, o, d, t_min, t_max, W, pc_max,
                     dir_octants=dir_octants, granularity=granularity)
    return _run_pair_schedule(clusters, S, W, n, nb, any_hit, None,
                              pc_max, return_stats,
                              granularity=granularity)


def pick_camera_tiles(height: int, width: int):
    """(th, tw) pixel-tile sizes whose th*tw-ray blocks feed the raster
    engine, or None if the frame doesn't tile cleanly.  Wide blocks win
    for coherent waves (measured: W=1024 > 512 > 256, PERF.md), so pick
    the largest power-of-two tile edge dividing each dimension, and
    require >= 256 rays per block (below that, binning overhead wins)."""
    def edge(x):
        for t in (32, 16, 8):
            if x % t == 0:
                return t
        return 0
    th, tw = edge(height), edge(width)
    if th * tw < 256:
        return None
    return th, tw


def make_camera_intersect(intersector, point, S: int, H: int, W: int,
                          th: int, tw: int):
    """An ``intersect``-compatible callable that routes a camera wave
    through the raster engine.

    The integrators flatten rays in (sample, row, col) order; this
    wrapper re-views them in (sample, tile, in-tile) order via pure
    reshape/transposes (NOT gathers), queries ``intersect_from`` with
    th*tw-ray blocks, and transposes the Hit back — callers see the
    original order.  Hit t/prim are BIT-exact vs the marcher; the
    winner u/v (carried in-kernel) agree only to fp accumulation order
    (~3e-6 — MXU dot vs the marcher's post-hoc einsum), so rendered
    images match to fp noise."""
    nh, nw = H // th, W // tw

    def to_tiles(a):
        rest = a.shape[1:]
        b = a.reshape((S, nh, th, nw, tw) + rest)
        return jnp.swapaxes(b, 2, 3).reshape((S * H * W,) + rest)

    def from_tiles(a):
        rest = a.shape[1:]
        b = a.reshape((S, nh, nw, th, tw) + rest)
        return jnp.swapaxes(b, 2, 3).reshape((S * H * W,) + rest)

    def isect(scene, o, d, t_min=1e-3, t_max=INF):
        n = o.shape[0]
        t_max_t = (to_tiles(jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32), (n,)))
            if jnp.ndim(t_max) else t_max)
        hit = intersector.intersect_from(
            scene, to_tiles(o), to_tiles(d), mode="origin", point=point,
            t_min=t_min, t_max=t_max_t, block_rays=th * tw)
        return jax.tree.map(from_tiles, hit)

    return isect


def make_tiled_bundle_intersect(intersector, S: int, H: int, W: int,
                                th: int, tw: int,
                                block_rays: int | None = None,
                                pc_max: int | None = None,
                                radius: float = 0.0):
    """An ``intersect``-compatible callable routing SECONDARY waves
    (bounce rays, NEE shadow rays) through the bundle engine
    (:func:`bundle_query` via ``intersect_bundled``).

    Same layout contract as :func:`make_camera_intersect`: rays arrive
    flattened in (sample, row, col) order and are re-viewed into
    (sample, tile, in-tile) order by pure transposes.  Secondary rays
    keep their pixel's lane, so a tile's bounce origins are its
    primary-hit surface patch — exactly the spatial coherence the
    bundle binning exploits.  Dead lanes (t_max <= t_min) drop out of
    the block bounds; schedule overflow falls back to the marcher
    (exact, see intersect_bundled)."""
    nh, nw = H // th, W // tw
    br = block_rays or (th * tw)

    def to_tiles(a):
        rest = a.shape[1:]
        b = a.reshape((S, nh, th, nw, tw) + rest)
        return jnp.swapaxes(b, 2, 3).reshape((S * H * W,) + rest)

    def from_tiles(a):
        rest = a.shape[1:]
        b = a.reshape((S, nh, nw, th, tw) + rest)
        return jnp.swapaxes(b, 2, 3).reshape((S * H * W,) + rest)

    def tile_bcast(x, n):
        return (to_tiles(jnp.broadcast_to(
            jnp.asarray(x, jnp.float32), (n,))) if jnp.ndim(x) else x)

    def isect(scene, o, d, t_min=1e-3, t_max=INF, any_hit=False):
        n = o.shape[0]
        if radius > 0.0 and not any_hit:
            # two-pass short-ray-first (intersect_short_first): capped
            # bundle pass resolves the near hits cheaply, the marcher
            # sweeps only the unresolved far/miss tail
            hit = intersector.intersect_short_first(
                scene, to_tiles(o), to_tiles(d),
                t_min=tile_bcast(t_min, n), t_max=tile_bcast(t_max, n),
                radius=radius, block_rays=br, pc_max=pc_max)
        else:
            hit = intersector.intersect_bundled(
                scene, to_tiles(o), to_tiles(d),
                t_min=tile_bcast(t_min, n), t_max=tile_bcast(t_max, n),
                any_hit=any_hit, block_rays=br, pc_max=pc_max)
        return jax.tree.map(from_tiles, hit)

    def any_hit_fn(scene, o, d, t_min=1e-3, t_max=INF):
        return isect(scene, o, d, t_min=t_min, t_max=t_max,
                     any_hit=True).is_hit

    isect.any_hit = any_hit_fn
    return isect


def camera_tile_layout(intersector, camera, S: int, height: int,
                       width: int):
    """The integrators' auto-detect hook: a static (S, H, W, th, tw)
    layout tuple when the camera wave can take the raster engine — the
    intersector carries raster tables, the camera is a pinhole (common
    origin; DOF lens origins are not), and the frame tiles cleanly —
    else None (callers keep the sorted-march path)."""
    if getattr(intersector, "raster", None) is None:
        return None
    if not hasattr(intersector, "intersect_from"):
        return None
    if float(getattr(camera, "aperture", 0.0)) != 0.0:
        return None
    tiles = pick_camera_tiles(height, width)
    if tiles is None:
        return None
    return (S, height, width, tiles[0], tiles[1])
