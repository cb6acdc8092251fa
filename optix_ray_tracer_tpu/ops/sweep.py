"""Cluster-sweep intersection — the dense wavefront design sized to the
TPU's REAL cost model.

Measured on the target chip (true host-synced timings): dense math runs at
TFLOP/s, XLA sorts of 1M keys cost ~11 ms, but GATHERS run ~100x below
stream bandwidth and per-lane dynamic loops cost milliseconds per step.
Every pointer-chasing traversal (per-ray stacks, bitstacks, packets) is
therefore architecturally wrong here.  This module restructures nearest-hit
queries as a handful of big dense operations per pass:

1. Triangles are partitioned (leaf-aligned sweep-SAH on host; jittable
   median split on device; Morton chunking as the cheap fallback) into
   CLUSTERS of CHUNK consecutive prims (spatially compact by
   construction); cluster AABBs are the only acceleration data — no tree.
2. Per pass, every ray computes slab entries against ALL cluster boxes on
   the fly (a fused (R, C) reduction — dense VPU work, never materialized),
   picks its nearest unvisited cluster by a strictly-increasing
   (entry, cluster_id) lexicographic key, and
3. rays are SORTED by candidate cluster; 128-ray blocks then sweep a
   contiguous WINDOW of sorted triangles around the block's first
   candidate — one dynamic-slice window per BLOCK (scalar index -> DMA),
   tested densely ray x tri in Woop space (MXU-shaped matmuls).
   Window hits on neighboring clusters' triangles are real hits (the sorted
   array is the scene), so wider windows only add correct coverage.
4. A ray's visited-mark advances only when its candidate cluster was fully
   inside the swept window — progress is guaranteed, correctness exact.

The loop repeats while any ray still has an unvisited cluster nearer than
its current best hit — identical termination criterion to BVH traversal,
evaluated wavefront-wide.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from optix_ray_tracer_tpu.ops.bvh import morton_codes
from optix_ray_tracer_tpu.ops.intersect import (
    DEFAULT_T_MIN, Hit, PRIM_NONE, PRIM_TRIANGLE,
)
from optix_ray_tracer_tpu.scene.geometry import Scene
from optix_ray_tracer_tpu.utils.vecmath import INF

import os as _os

# triangles per cluster (post-SAH retune: 256-tri clusters beat 512 on
# BOTH wave classes for the MARCHER, PERF.md round-3 "cluster-constant
# re-sweep"; the raster engine's per-pair grid-step overhead favors
# bigger clusters — ORT_CHUNK/ORT_SUBS are the sweep knobs for
# re-measuring under the schedule-driven engines, round-4)
CHUNK = int(_os.environ.get("ORT_CHUNK", "256"))
BLOCK_RAYS = 128     # rays per sweep block
WINDOW_CHUNKS = 1    # clusters swept per block window
WINDOW_TRIS = CHUNK * WINDOW_CHUNKS


SUBS_PER_CLUSTER = int(_os.environ.get("ORT_SUBS", "4"))
SUB_TRIS = CHUNK // SUBS_PER_CLUSTER

# woop_t row order: each 4-row group is one contiguous matmul operand for
# the marcher ([inverse row | translation component])
_WOOP_T_PERM = (0, 1, 2, 9, 3, 4, 5, 10, 6, 7, 8, 11)
WOOP_T_ROWS = 16  # 12 data rows padded to the fp32 sublane tile


def woop_transforms(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray
                    ) -> np.ndarray:
    """Per-triangle world->unit-triangle transforms (n, 12).

    M = inverse([e1 | e2 | e1 x e2]) (columns); c = M @ v0.
    Ray test: o' = M@o - c; d' = M@d; t = -o'z/d'z; u = o'x + t d'x;
    v = o'y + t d'y.  Degenerate triangles get zero rows (never hit:
    d'z == 0 -> t = inf).
    """
    n = v0.shape[0]
    nrm = np.cross(e1, e2)
    A = np.stack([e1, e2, nrm], axis=-1)          # (n, 3, 3) columns
    det = np.linalg.det(A)
    ok = np.abs(det) > 1e-18
    M = np.zeros((n, 3, 3), np.float64)
    if ok.any():
        M[ok] = np.linalg.inv(A[ok])
    c = np.einsum('nij,nj->ni', M, v0)
    return np.concatenate([M.reshape(n, 9), c], axis=1).astype(np.float32)


def _transpose_woop(woop, reshape_mod):
    """(n_pad, 12) Woop rows -> (C, WOOP_T_ROWS, CHUNK) per-cluster blocks."""
    n_pad = woop.shape[0]
    C = n_pad // CHUNK
    wt = woop[:, list(_WOOP_T_PERM)].reshape(C, CHUNK, 12)
    wt = reshape_mod.swapaxes(wt, 1, 2)              # (C, 12, CHUNK)
    pad = reshape_mod.zeros((C, WOOP_T_ROWS - 12, CHUNK), woop.dtype)
    return reshape_mod.concatenate([wt, pad], axis=1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterSet:
    """Partition-ordered scene clusters (device arrays).

    woop:        (n_pad, 12) sorted-triangle Woop transforms
    woop_t:      (C, 16, CHUNK) per-cluster TRANSPOSED Woop rows for the
                 block marcher's DMA: row layout [r0xyz, cx, r1xyz, cy,
                 r2xyz, cz, 0*4], triangles on the lane axis.  One cluster
                 is a contiguous 32 KB block (vs 256 KB for 128-padded
                 row-major rows — the DMA is the marcher's bottleneck)
    prim_index:  (n_pad,) sorted slot -> original triangle id
    cluster_min: (C, 3) cluster AABBs
    cluster_max: (C, 3)
    sub_min:     (C*SUBS_PER_CLUSTER, 3) sub-cluster AABBs (SUB_TRIS-tri
                 granularity, used by the block marcher's lazy per-visit
                 second-level cull)
    sub_max:     (C*SUBS_PER_CLUSTER, 3)
    """
    woop: jax.Array
    woop_t: jax.Array
    prim_index: jax.Array
    cluster_min: jax.Array
    cluster_max: jax.Array
    sub_min: jax.Array
    sub_max: jax.Array

    @property
    def num_clusters(self) -> int:
        return self.cluster_min.shape[0]


def _sah_chunk_order(cents: np.ndarray, leaf: int) -> np.ndarray:
    """Recursive leaf-ALIGNED sweep-SAH partition of the triangle order.

    Clusters are contiguous `leaf`-triangle runs of the final order, so the
    partitioner's job is purely to choose WHICH triangles share a run.
    Each recursion sorts the node's centroids along each axis, evaluates
    the binned SAH cost (child-bbox surface area x child count) at every
    leaf-aligned cut, and splits at the best (axis, cut).  Leaf-aligned
    cuts keep every cluster except the global tail exactly full, which the
    marcher's shapes require.  Beats plain Morton chunking 2-3x on
    clusters-entered-per-ray (measured: bench sphere 4.2 -> 1.5 coherent,
    block unions 100 -> 32 incoherent) because Morton runs straddle cell
    boundaries and produce long thin boxes.

    Returns the permutation: output slot -> original triangle id."""
    n = cents.shape[0]
    out = np.empty(n, np.int64)
    pos = 0
    stack = [np.arange(n, dtype=np.int64)]
    while stack:
        idx = stack.pop()
        m = idx.shape[0]
        if m <= leaf:
            out[pos:pos + m] = idx
            pos += m
            continue
        c = cents[idx]
        best = None
        for axis in range(3):
            srt = np.argsort(c[:, axis], kind="stable")
            cs = c[srt]
            pref_lo = np.minimum.accumulate(cs, 0)
            pref_hi = np.maximum.accumulate(cs, 0)
            suf_lo = np.minimum.accumulate(cs[::-1], 0)[::-1]
            suf_hi = np.maximum.accumulate(cs[::-1], 0)[::-1]
            cuts = np.arange(leaf, m, leaf)
            dl = pref_hi[cuts - 1] - pref_lo[cuts - 1]
            dr = suf_hi[cuts] - suf_lo[cuts]
            sa_l = dl[:, 0] * dl[:, 1] + dl[:, 1] * dl[:, 2] \
                + dl[:, 0] * dl[:, 2]
            sa_r = dr[:, 0] * dr[:, 1] + dr[:, 1] * dr[:, 2] \
                + dr[:, 0] * dr[:, 2]
            nl = cuts.astype(np.float64)
            # nan_to_num: NaN centroids (degenerate tris sort last) poison
            # the suffix boxes; treat those cuts as merely very bad
            cost = np.nan_to_num(sa_l * nl + sa_r * (m - nl), nan=np.inf)
            k = int(np.argmin(cost))
            if best is None or cost[k] < best[0]:
                best = (cost[k], cuts[k], srt)
        _, cut, srt = best
        stack.append(idx[srt[cut:]])
        stack.append(idx[srt[:cut]])
    assert pos == n
    return out


def _median_levels(n: int) -> list[np.ndarray]:
    """Static per-level segment-id arrays for the JITTABLE median-split
    partition (:func:`_median_order_device`).

    With leaf-aligned cuts the split positions depend only on segment
    SIZES, never on the data — so the whole recursion tree is known from
    ``n`` alone.  Level ``l``'s array maps position -> segment id in the
    order the array holds after ``l`` in-segment sorts; cuts are
    CHUNK-aligned above cluster granularity (cluster membership) and
    SUB_TRIS-aligned inside clusters (sub-box compactness)."""
    levels: list[np.ndarray] = []
    segs = [(0, n)]
    while True:
        seg_ids = np.zeros(n, np.int32)
        nxt: list[tuple[int, int]] = []
        any_split = False
        for i, (start, m) in enumerate(segs):
            seg_ids[start:start + m] = i
            if m <= SUB_TRIS:
                nxt.append((start, m))
                continue
            a = CHUNK if m > CHUNK else SUB_TRIS
            half = -(-(m // 2) // a) * a
            if half >= m:
                half = (m // 2) // a * a
            if half == 0:
                nxt.append((start, m))
                continue
            any_split = True
            nxt.append((start, half))
            nxt.append((start + half, m - half))
        if not any_split:
            return levels
        levels.append(seg_ids)
        segs = nxt


def _median_order_device(cents: jax.Array) -> jax.Array:
    """Jittable median-split partition: the device-rebuild analog of the
    host sweep-SAH build (measured within a few % of SAH on
    clusters-entered/ray and block unions — 2-3x better than Morton,
    whose cell-straddling runs produce long thin cluster boxes).

    Each level sorts elements within their current segment by the
    segment's widest centroid axis (one stable two-key ``lax.sort``),
    then static leaf-aligned cuts define the children.  Everything is
    shape-static: ~log2(n/SUB_TRIS) unrolled levels of
    segment-min/max + sort.  Returns slot -> original triangle id."""
    n = cents.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    cur = cents
    for seg_np in _median_levels(n):
        num_seg = int(seg_np[-1]) + 1
        seg = jnp.asarray(seg_np)
        lo = jax.ops.segment_min(cur, seg, num_segments=num_seg,
                                 indices_are_sorted=True)
        hi = jax.ops.segment_max(cur, seg, num_segments=num_seg,
                                 indices_are_sorted=True)
        axis = jnp.argmax(hi - lo, axis=1).astype(jnp.int32)
        key = jnp.take_along_axis(cur, axis[seg][:, None], axis=1)[:, 0]
        # primary key: the (already position-sorted) static segment id —
        # the sort therefore only permutes WITHIN segments
        _, _, perm, c0, c1, c2 = jax.lax.sort(
            (seg, key, perm, cur[:, 0], cur[:, 1], cur[:, 2]),
            num_keys=2, is_stable=True)
        cur = jnp.stack([c0, c1, c2], axis=1)
    return perm


def build_clusters(tri_vertices, method: str = "sah") -> ClusterSet:
    """Partition + chunk (host->device; no hierarchy to build).

    method: "sah" (default) = leaf-aligned sweep-SAH partition down to
    SUB_TRIS granularity (clusters AND their SUB_TRIS-tri sub-boxes are
    spatially compact); "morton" = Morton-sort chunking (matches the
    device-side `rebuild_clusters` order exactly)."""
    tv = np.asarray(tri_vertices, np.float32)
    n = tv.shape[0]
    cents = tv.mean(axis=1)
    lo = tv.min(axis=(0, 1))
    hi = tv.max(axis=(0, 1))
    if method == "sah" and n > CHUNK:
        c64 = cents.astype(np.float64)
        order = _sah_chunk_order(c64, CHUNK)
        # refine WITHIN each full cluster so its SUBS_PER_CLUSTER
        # contiguous SUB_TRIS-tri sub-boxes are compact too (sub-cull
        # quality); cluster membership is already fixed, so this only
        # permutes inside each CHUNK-run
        for s in range(0, n - CHUNK + 1, CHUNK):
            seg = order[s:s + CHUNK]
            order[s:s + CHUNK] = seg[_sah_chunk_order(c64[seg], SUB_TRIS)]
    elif method in ("sah", "morton"):
        codes = np.asarray(morton_codes(jnp.asarray(cents), jnp.asarray(lo),
                                        jnp.asarray(hi)))
        order = np.argsort(codes, kind="stable").astype(np.int64)
    else:
        raise ValueError(f"unknown cluster build method: {method!r}")

    # pad triangle rows so the cluster count is a multiple of WINDOW_CHUNKS:
    # window starts are then always window-aligned (Pallas BlockSpec index
    # maps address whole blocks)
    n_pad = max(((n + WINDOW_TRIS - 1) // WINDOW_TRIS) * WINDOW_TRIS,
                WINDOW_TRIS)
    sorted_tris = tv[order]
    v0 = sorted_tris[:, 0].astype(np.float64)
    e1 = (sorted_tris[:, 1] - sorted_tris[:, 0]).astype(np.float64)
    e2 = (sorted_tris[:, 2] - sorted_tris[:, 0]).astype(np.float64)
    woop = np.zeros((n_pad, 12), np.float32)
    woop[:n] = woop_transforms(v0, e1, e2)
    prim_index = np.zeros(n_pad, np.int32)
    prim_index[:n] = order

    C = n_pad // CHUNK
    pad_tris = np.full((n_pad, 3, 3), np.nan, np.float32)
    pad_tris[:n] = sorted_tris
    grouped = pad_tris.reshape(C, CHUNK, 3, 3)
    import warnings
    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        cmin = np.nanmin(grouped, axis=(1, 2))
        cmax = np.nanmax(grouped, axis=(1, 2))
    # clusters that are pure padding keep NaN boxes: every slab comparison
    # is false, so they can never be hit (an (+INF,-INF) "empty box" FAILS
    # here — infinity arithmetic in the slab test yields ent=tmin, ext=bt)

    sub_grouped = pad_tris.reshape(C * SUBS_PER_CLUSTER, SUB_TRIS, 3, 3)
    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        smin = np.nanmin(sub_grouped, axis=(1, 2))
        smax = np.nanmax(sub_grouped, axis=(1, 2))
    return ClusterSet(
        woop=jnp.asarray(woop), woop_t=jnp.asarray(_transpose_woop(woop, np)),
        prim_index=jnp.asarray(prim_index),
        cluster_min=jnp.asarray(cmin), cluster_max=jnp.asarray(cmax),
        sub_min=jnp.asarray(smin), sub_max=jnp.asarray(smax))


# ---------------------------------------------------------------------------
# Dense per-pass primitives
# ---------------------------------------------------------------------------

def _candidate_clusters(clusters: ClusterSet, o, inv_d, t_min, best_t,
                        last_entry, last_cid):
    """Nearest unvisited cluster per ray (fused (R, C) reduction).

    Ordering key is lexicographic (entry_t, cluster_id); a ray's visited
    frontier is (last_entry, last_cid).  Returns (cand_id, cand_entry,
    active)."""
    cmin = clusters.cluster_min                     # (C, 3)
    cmax = clusters.cluster_max
    # (R, C) slab entries, computed fused under the reduction
    t0 = (cmin[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    t1 = (cmax[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)
    enter = jnp.maximum(jnp.max(tlo, -1), t_min[:, None])
    exit_ = jnp.minimum(jnp.min(thi, -1), best_t[:, None])
    hit = enter <= exit_

    cid = jnp.arange(cmin.shape[0], dtype=jnp.int32)[None, :]
    unvisited = (enter > last_entry[:, None]) | \
        ((enter == last_entry[:, None]) & (cid > last_cid[:, None]))
    key = jnp.where(hit & unvisited, enter, INF)
    # min and argmin as two independent fused reductions: reusing the key
    # matrix via take_along_axis forces XLA to materialize (R, C) in HBM
    cand = jnp.argmin(key, axis=-1).astype(jnp.int32)   # first min => min cid
    cand_entry = jnp.min(key, axis=-1)
    active = cand_entry < INF
    return cand, cand_entry, active


def _frontier_after_sweep(clusters: ClusterSet, o, inv_d, t_min, best_t,
                          last_entry, last_cid, win_lo, win_hi):
    """New visited frontier after sweeping clusters [win_lo, win_hi).

    The frontier jumps to just below the smallest unvisited key OUTSIDE the
    swept window (every unvisited cluster with a smaller key was inside the
    window, hence fully tested) — advancing through the whole window per
    pass instead of one cluster.  Clusters with entry >= best_t are pruned
    permanently (best_t only shrinks)."""
    cmin = clusters.cluster_min
    cmax = clusters.cluster_max
    t0 = (cmin[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    t1 = (cmax[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)
    enter = jnp.maximum(jnp.max(tlo, -1), t_min[:, None])
    exit_ = jnp.minimum(jnp.min(thi, -1), best_t[:, None])
    hit = enter <= exit_

    cid = jnp.arange(cmin.shape[0], dtype=jnp.int32)[None, :]
    unvisited = (enter > last_entry[:, None]) | \
        ((enter == last_entry[:, None]) & (cid > last_cid[:, None]))
    outside = (cid < win_lo[:, None]) | (cid >= win_hi[:, None])
    key = jnp.where(hit & unvisited & outside, enter, INF)
    nxt = jnp.argmin(key, axis=-1).astype(jnp.int32)
    nxt_entry = jnp.min(key, axis=-1)
    done = nxt_entry >= INF
    # predecessor of the next-out key: (entry, cid-1)
    new_entry = jnp.where(done, INF, nxt_entry)
    new_cid = jnp.where(done, jnp.int32(0), nxt - 1)
    return new_entry, new_cid, ~done


def _window_sweep_xla(woop, starts, o, d, t_min, best):
    """XLA fallback leaf sweep: per-BLOCK window dynamic-slice + dense test.

    starts: (NB,) window start rows (multiples of CHUNK); o, d: (NB, B, 3);
    best: tuple of (NB, B) arrays (t, slot, u, v).
    """
    def one_block(start, ob, db, tmin_b, bt, bslot, bu, bv):
        rows = jax.lax.dynamic_slice(woop, (start, 0), (WINDOW_TRIS, 12))
        M = rows[:, :9].reshape(WINDOW_TRIS, 3, 3)
        c = rows[:, 9:12]
        op = jnp.einsum('wij,bj->bwi', M, ob,
                        precision=jax.lax.Precision.HIGHEST) - c[None]
        dp = jnp.einsum('wij,bj->bwi', M, db,
                        precision=jax.lax.Precision.HIGHEST)
        dz = dp[..., 2]
        t = -op[..., 2] / jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)
        uu = op[..., 0] + t * dp[..., 0]
        vv = op[..., 1] + t * dp[..., 1]
        ok = ((jnp.abs(dz) > 1e-12) & (uu >= 0.0) & (vv >= 0.0)
              & (uu + vv <= 1.0) & (t > tmin_b[:, None])
              & (t < bt[:, None]))
        t = jnp.where(ok, t, INF)
        li = jnp.argmin(t, axis=-1)
        lt = jnp.take_along_axis(t, li[:, None], -1)[:, 0]
        closer = lt < bt
        slot = jnp.where(closer, start + li.astype(jnp.int32), bslot)
        return (jnp.where(closer, lt, bt), slot,
                jnp.where(closer, jnp.take_along_axis(uu, li[:, None], -1)[:, 0], bu),
                jnp.where(closer, jnp.take_along_axis(vv, li[:, None], -1)[:, 0], bv))

    return jax.vmap(one_block)(starts, o, d, t_min, *best)


def _window_sweep(clusters, starts, o, d, t_min, best, use_pallas: bool):
    if use_pallas:
        from optix_ray_tracer_tpu.ops.pallas.leaf_sweep import window_sweep_pallas
        return window_sweep_pallas(clusters.woop, starts, o, d, t_min, best)
    return _window_sweep_xla(clusters.woop, starts, o, d, t_min, best)


@partial(jax.jit, static_argnames=("max_passes", "use_pallas"))
def sweep_intersect(clusters: ClusterSet, o, d, t_min, t_max,
                    max_passes: int = 64, use_pallas: bool = False):
    """Nearest-hit query over the cluster set.  o, d (R, 3); t bounds (R,).

    Returns (t, slot, u, v) with slot an index into the SORTED prim arrays
    (-1 = miss)."""
    R = o.shape[0]
    n_pad = clusters.woop.shape[0]
    C = clusters.num_clusters
    max_start = n_pad - WINDOW_TRIS
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e12)
    NB = R // BLOCK_RAYS
    assert NB * BLOCK_RAYS == R, "caller pads to BLOCK_RAYS"

    state = dict(
        best_t=t_max.astype(jnp.float32),
        slot=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32),
        v=jnp.zeros((R,), jnp.float32),
        last_entry=jnp.full((R,), -INF, jnp.float32),
        last_cid=jnp.full((R,), -1, jnp.int32),
        active=jnp.ones((R,), bool),
        it=jnp.int32(0))

    def cond(s):
        return jnp.any(s["active"]) & (s["it"] < max_passes)

    # clusters partition into aligned window groups; rays are padded per
    # group to block boundaries so every 128-ray block serves exactly ONE
    # window -> every active ray's candidate is swept every pass (no
    # starvation by block neighbors wanting other windows).
    NW = (C + WINDOW_CHUNKS - 1) // WINDOW_CHUNKS
    R_pad = ((R + (NW + 1) * (BLOCK_RAYS - 1)) // BLOCK_RAYS + 1) * BLOCK_RAYS
    NBP = R_pad // BLOCK_RAYS

    def body(s):
        cand, cand_entry, active = _candidate_clusters(
            clusters, o, inv_d, t_min, s["best_t"], s["last_entry"],
            s["last_cid"])

        # group = window id of the candidate; inactive rays -> group NW
        group = jnp.where(active, cand // WINDOW_CHUNKS, NW).astype(jnp.int32)
        perm = jnp.argsort(group)            # stable: ray order within group
        group_s = group[perm]

        counts = jax.ops.segment_sum(jnp.ones((R,), jnp.int32), group_s,
                                     num_segments=NW + 1)
        padded = ((counts + BLOCK_RAYS - 1) // BLOCK_RAYS) * BLOCK_RAYS
        pad_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(padded)[:-1].astype(jnp.int32)])
        src_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(counts)[:-1].astype(jnp.int32)])

        # padded slot -> source sorted-ray (or invalid filler)
        slot_ids = jnp.arange(R_pad, dtype=jnp.int32)
        g_of_slot = (jnp.searchsorted(pad_off, slot_ids, side="right") - 1
                     ).astype(jnp.int32)
        g_of_slot = jnp.clip(g_of_slot, 0, NW)
        local = slot_ids - pad_off[g_of_slot]
        valid_slot = local < counts[g_of_slot]
        src = jnp.clip(src_off[g_of_slot] + local, 0, R - 1)
        ray_of_slot = perm[src]              # original ray index per slot

        o_s = jnp.where(valid_slot[:, None], o[ray_of_slot], 0.0)
        d_s = jnp.where(valid_slot[:, None], d[ray_of_slot], 0.0)
        d_s = d_s.at[:, 2].set(jnp.where(valid_slot, d_s[:, 2], 1.0))
        tmin_s = jnp.where(valid_slot, t_min[ray_of_slot], 1.0)
        bt_s = jnp.where(valid_slot, s["best_t"][ray_of_slot], 0.0)

        # every block belongs to one group; its window is that group's
        blk_group = g_of_slot.reshape(NBP, BLOCK_RAYS)[:, 0]
        starts = jnp.clip(blk_group * WINDOW_TRIS, 0, max_start)

        best_in = (bt_s.reshape(NBP, BLOCK_RAYS),
                   jnp.full((NBP, BLOCK_RAYS), -1, jnp.int32),
                   jnp.zeros((NBP, BLOCK_RAYS), jnp.float32),
                   jnp.zeros((NBP, BLOCK_RAYS), jnp.float32))
        bt2, slot2, u2, v2 = _window_sweep(
            clusters, starts, o_s.reshape(NBP, BLOCK_RAYS, 3),
            d_s.reshape(NBP, BLOCK_RAYS, 3),
            tmin_s.reshape(NBP, BLOCK_RAYS), best_in, use_pallas)

        # map each original ray back to its padded slot (pure gathers)
        rank_in_group = (jnp.arange(R, dtype=jnp.int32)
                         - src_off[group_s])          # rank of sorted ray
        slot_of_sorted = pad_off[group_s] + rank_in_group
        inv = jnp.argsort(perm)
        slot_of_ray = slot_of_sorted[inv]             # (R,)

        bt2 = bt2.reshape(-1)[slot_of_ray]
        slot2 = slot2.reshape(-1)[slot_of_ray]
        u2 = u2.reshape(-1)[slot_of_ray]
        v2 = v2.reshape(-1)[slot_of_ray]
        win_lo = jnp.where(active, (cand // WINDOW_CHUNKS) * WINDOW_CHUNKS,
                           0).astype(jnp.int32)
        win_lo = jnp.minimum(win_lo, max_start // CHUNK)
        win_hi = win_lo + WINDOW_CHUNKS

        improved = active & (bt2 < s["best_t"])
        best_t = jnp.where(improved, bt2, s["best_t"])
        slot = jnp.where(improved, slot2, s["slot"])
        u = jnp.where(improved, u2, s["u"])
        v = jnp.where(improved, v2, s["v"])

        # advance the frontier through everything the window covered
        new_entry, new_cid, still_active = _frontier_after_sweep(
            clusters, o, inv_d, t_min, best_t, s["last_entry"],
            s["last_cid"], win_lo, win_hi)
        last_entry = jnp.where(active, new_entry, s["last_entry"])
        last_cid = jnp.where(active, new_cid, s["last_cid"])

        return dict(best_t=best_t, slot=slot, u=u, v=v,
                    last_entry=last_entry, last_cid=last_cid,
                    active=active & still_active, it=s["it"] + 1)

    out = jax.lax.while_loop(cond, body, state)
    return out["best_t"], out["slot"], out["u"], out["v"]


@partial(jax.jit, static_argnames=("use_pallas",))
def _sweep_pass(clusters: ClusterSet, o, d, t_min, best_t, slot, u, v,
                last_entry, last_cid, use_pallas: bool):
    """One sweep pass over the CURRENT ray set (jitted; host drives the
    loop so the wavefront can be compacted between passes).

    Returns (best_t, slot, u, v, last_entry, last_cid, active)."""
    R = o.shape[0]
    n_pad = clusters.woop.shape[0]
    C = clusters.num_clusters
    max_start = n_pad - WINDOW_TRIS
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e12)
    NW = (C + WINDOW_CHUNKS - 1) // WINDOW_CHUNKS
    R_pad = ((R + (NW + 1) * (BLOCK_RAYS - 1)) // BLOCK_RAYS + 1) * BLOCK_RAYS
    NBP = R_pad // BLOCK_RAYS

    cand, cand_entry, active = _candidate_clusters(
        clusters, o, inv_d, t_min, best_t, last_entry, last_cid)

    group = jnp.where(active, cand // WINDOW_CHUNKS, NW).astype(jnp.int32)
    perm = jnp.argsort(group)
    group_s = group[perm]
    counts = jax.ops.segment_sum(jnp.ones((R,), jnp.int32), group_s,
                                 num_segments=NW + 1)
    padded = ((counts + BLOCK_RAYS - 1) // BLOCK_RAYS) * BLOCK_RAYS
    pad_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    src_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(counts)[:-1].astype(jnp.int32)])

    slot_ids = jnp.arange(R_pad, dtype=jnp.int32)
    g_of_slot = jnp.clip(
        (jnp.searchsorted(pad_off, slot_ids, side="right") - 1), 0, NW
    ).astype(jnp.int32)
    local = slot_ids - pad_off[g_of_slot]
    valid_slot = local < counts[g_of_slot]
    src = jnp.clip(src_off[g_of_slot] + local, 0, R - 1)
    ray_of_slot = perm[src]

    o_s = jnp.where(valid_slot[:, None], o[ray_of_slot], 0.0)
    d_s = jnp.where(valid_slot[:, None], d[ray_of_slot], 0.0)
    d_s = d_s.at[:, 2].set(jnp.where(valid_slot, d_s[:, 2], 1.0))
    tmin_s = jnp.where(valid_slot, t_min[ray_of_slot], 1.0)
    bt_s = jnp.where(valid_slot, best_t[ray_of_slot], 0.0)

    blk_group = g_of_slot.reshape(NBP, BLOCK_RAYS)[:, 0]
    starts = jnp.clip(blk_group * WINDOW_TRIS, 0, max_start)
    best_in = (bt_s.reshape(NBP, BLOCK_RAYS),
               jnp.full((NBP, BLOCK_RAYS), -1, jnp.int32),
               jnp.zeros((NBP, BLOCK_RAYS), jnp.float32),
               jnp.zeros((NBP, BLOCK_RAYS), jnp.float32))
    bt2, slot2, u2, v2 = _window_sweep(
        clusters, starts, o_s.reshape(NBP, BLOCK_RAYS, 3),
        d_s.reshape(NBP, BLOCK_RAYS, 3),
        tmin_s.reshape(NBP, BLOCK_RAYS), best_in, use_pallas)

    rank_in_group = jnp.arange(R, dtype=jnp.int32) - src_off[group_s]
    slot_of_sorted = pad_off[group_s] + rank_in_group
    inv = jnp.argsort(perm)
    slot_of_ray = slot_of_sorted[inv]

    bt2 = bt2.reshape(-1)[slot_of_ray]
    slot2 = slot2.reshape(-1)[slot_of_ray]
    u2 = u2.reshape(-1)[slot_of_ray]
    v2 = v2.reshape(-1)[slot_of_ray]
    win_lo = jnp.minimum(
        jnp.where(active, (cand // WINDOW_CHUNKS) * WINDOW_CHUNKS, 0),
        max_start // CHUNK).astype(jnp.int32)
    win_hi = win_lo + WINDOW_CHUNKS

    improved = active & (bt2 < best_t)
    best_t = jnp.where(improved, bt2, best_t)
    slot = jnp.where(improved, slot2, slot)
    u = jnp.where(improved, u2, u)
    v = jnp.where(improved, v2, v)

    new_entry, new_cid, still_active = _frontier_after_sweep(
        clusters, o, inv_d, t_min, best_t, last_entry, last_cid,
        win_lo, win_hi)
    last_entry = jnp.where(active, new_entry, last_entry)
    last_cid = jnp.where(active, new_cid, last_cid)
    return best_t, slot, u, v, last_entry, last_cid, active & still_active


def _next_bucket(n: int, full: int) -> int:
    """Smallest allowed bucket >= n.  Buckets shrink by 16x steps from the
    full wavefront size: each distinct bucket size is one (cached) compile
    of the pass program, and remote TPU compiles are expensive."""
    b = max(full, BLOCK_RAYS)
    while b // 16 >= max(n, BLOCK_RAYS):
        b //= 16
    return b


def sweep_intersect_host(clusters: ClusterSet, o, d, t_min, t_max,
                         use_pallas: bool = False, max_passes: int = 512):
    """Host-driven sweep with ACTIVE-RAY COMPACTION between passes.

    Most rays resolve in 1-2 passes; the lockstep tail (grazing rays)
    otherwise forces full-wavefront reductions every pass.  The host loop
    fetches the live count each pass (~6 ms sync) and compacts the wavefront
    into the next power-of-two bucket — pass cost tracks the ACTIVE count,
    ~10x faster end-to-end than the in-jit lockstep loop.  Not usable under
    an outer jit trace (the integrators keep ``sweep_intersect``); bench and
    host callers route here automatically.
    """
    import numpy as np

    R = o.shape[0]
    best_t = t_max.astype(jnp.float32)
    slot = jnp.full((R,), -1, jnp.int32)
    u = jnp.zeros((R,), jnp.float32)
    v = jnp.zeros((R,), jnp.float32)
    last_entry = jnp.full((R,), -INF, jnp.float32)
    last_cid = jnp.full((R,), -1, jnp.int32)

    # full-resolution result buffers; `idx` maps the live subset back
    res = dict(best_t=best_t, slot=slot, u=u, v=v)
    idx = jnp.arange(R, dtype=jnp.int32)
    cur = dict(o=o, d=d, t_min=t_min, best_t=best_t, slot=slot, u=u, v=v,
               last_entry=last_entry, last_cid=last_cid)

    for _ in range(max_passes):
        out = _sweep_pass(clusters, cur["o"], cur["d"], cur["t_min"],
                          cur["best_t"], cur["slot"], cur["u"], cur["v"],
                          cur["last_entry"], cur["last_cid"],
                          use_pallas=use_pallas)
        (cur["best_t"], cur["slot"], cur["u"], cur["v"],
         cur["last_entry"], cur["last_cid"], active) = out

        n_active = int(jnp.sum(active))        # host sync (cheap)
        if n_active == 0:
            break
        bucket = _next_bucket(n_active, R)
        if bucket < cur["o"].shape[0]:
            # write back everything, then keep only the live bucket
            res = {k: res[k].at[idx].set(cur[k])
                   for k in ("best_t", "slot", "u", "v")}
            order = jnp.argsort(~active)       # active rays first (stable)
            take = order[:bucket]
            keep = {k: cur[k][take] for k in cur}
            # bucket may exceed n_active: the extra rays are inactive and
            # terminate immediately (their frontier is exhausted)
            cur = keep
            idx = idx[take]

    res = {k: res[k].at[idx].set(cur[k]) for k in ("best_t", "slot", "u", "v")}
    return res["best_t"], res["slot"], res["u"], res["v"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SweepIntersector:
    """Drop-in intersector over the cluster sweep (+ dense sphere merge)."""
    clusters: ClusterSet
    use_pallas: bool = dataclasses.field(metadata=dict(static=True),
                                         default=False)

    def intersect(self, scene: Scene, o, d, t_min=DEFAULT_T_MIN,
                  t_max=INF) -> Hit:
        shape = o.shape[:-1]
        o2 = o.reshape(-1, 3)
        d2 = d.reshape(-1, 3)
        n = o2.shape[0]
        t_min_a = jnp.broadcast_to(
            jnp.asarray(t_min, jnp.float32).reshape(-1) if jnp.ndim(t_min)
            else jnp.asarray(t_min, jnp.float32), (n,))
        t_max_a = jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32).reshape(-1) if jnp.ndim(t_max)
            else jnp.asarray(t_max, jnp.float32), (n,))

        pad = (-n) % BLOCK_RAYS
        o_p = jnp.pad(o2, ((0, pad), (0, 0)))
        d_p = jnp.pad(d2, ((0, pad), (0, 0)), constant_values=0.0)
        d_p = d_p.at[n:, 2].set(1.0) if pad else d_p
        tmin_p = jnp.pad(t_min_a, (0, pad), constant_values=1.0)
        tmax_p = jnp.pad(t_max_a, (0, pad), constant_values=0.0)

        if isinstance(jnp.asarray(o_p), jax.core.Tracer):
            # under an outer jit trace (the integrators): in-jit loop
            t, slot, u, v = sweep_intersect(
                self.clusters, o_p, d_p, tmin_p, tmax_p,
                use_pallas=self.use_pallas)
        else:
            # host caller: compacting loop (~10x on wavefronts with tails)
            t, slot, u, v = sweep_intersect_host(
                self.clusters, o_p, d_p, tmin_p, tmax_p,
                use_pallas=self.use_pallas)
        t = t[:n]
        slot = slot[:n]
        u = u[:n]
        v = v[:n]
        missed = slot < 0
        prim_id = self.clusters.prim_index[jnp.maximum(slot, 0)]
        hit = Hit(
            t=jnp.where(missed, INF, t),
            prim_type=jnp.where(missed, PRIM_NONE,
                                PRIM_TRIANGLE).astype(jnp.int32),
            prim_id=jnp.where(missed, 0, prim_id).astype(jnp.int32),
            u=jnp.where(missed, 0.0, u),
            v=jnp.where(missed, 0.0, v))
        if scene.sphere_count > 0:
            from optix_ray_tracer_tpu.ops.raysort import sphere_bruteforce_merge
            hit = sphere_bruteforce_merge(scene, o2, d2, t_min_a, t_max_a,
                                           hit)
        return jax.tree.map(lambda x: x.reshape(shape + x.shape[1:]), hit)

    def __call__(self, scene: Scene, o, d, t_min=DEFAULT_T_MIN, t_max=INF) -> Hit:
        return self.intersect(scene, o, d, t_min, t_max)

    def any_hit(self, scene: Scene, o, d, t_min=DEFAULT_T_MIN, t_max=INF):
        return self.intersect(scene, o, d, t_min, t_max).is_hit


def make_sweep_intersector(scene: Scene, use_pallas: bool = False
                           ) -> SweepIntersector:
    import numpy as _np
    return SweepIntersector(
        clusters=build_clusters(_np.asarray(scene.triangles.vertices)),
        use_pallas=use_pallas)


@jax.jit
def refit_clusters(clusters: ClusterSet, tri_vertices) -> ClusterSet:
    """Device-side refit: recompute Woop rows + cluster/sub AABBs for NEW
    vertex positions while keeping the frame-0 Morton slot order.

    The TPU-native analog of the reference's per-frame IAS refit
    (src/Global/RendererImpl.cu:210-242): exact for any motion (boxes are
    recomputed, so queries stay correct); only cull efficiency decays as
    the stale Morton order stops matching the geometry — same tradeoff as
    a hardware refit.  Everything is jnp: no host round trip, no re-sort.

    ``tri_vertices`` must have the same triangle count the ClusterSet was
    built with.
    """
    n = tri_vertices.shape[0]
    n_pad = clusters.woop.shape[0]
    order = clusters.prim_index                       # pad slots gather tri 0
    sorted_tris = jnp.asarray(tri_vertices, jnp.float32)[order]
    valid = jnp.arange(n_pad) < n                     # pad slots are a suffix

    v0 = sorted_tris[:, 0]
    e1 = sorted_tris[:, 1] - v0
    e2 = sorted_tris[:, 2] - v0
    nrm = jnp.cross(e1, e2)
    # adjugate inverse of A = [e1 | e2 | nrm] (columns): row_i of inv(A) is
    # the cross product of the other two columns over det
    det = jnp.einsum("ni,ni->n", e1, jnp.cross(e2, nrm))
    ok = (jnp.abs(det) > 1e-18) & valid
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)[:, None]
    r0 = jnp.cross(e2, nrm) * inv_det
    r1 = jnp.cross(nrm, e1) * inv_det
    r2 = jnp.cross(e1, e2) * inv_det
    c = jnp.stack([jnp.einsum("ni,ni->n", r0, v0),
                   jnp.einsum("ni,ni->n", r1, v0),
                   jnp.einsum("ni,ni->n", r2, v0)], axis=-1)
    woop = jnp.concatenate([r0, r1, r2, c], axis=-1)  # (n_pad, 12)

    C = n_pad // CHUNK
    tmin = jnp.where(valid[:, None], jnp.min(sorted_tris, axis=1), INF)
    tmax = jnp.where(valid[:, None], jnp.max(sorted_tris, axis=1), -INF)

    def _boxes(lo, hi, groups):
        glo = jnp.min(lo.reshape(groups, -1, 3), axis=1)
        ghi = jnp.max(hi.reshape(groups, -1, 3), axis=1)
        # pure-padding groups get NaN boxes (kernel validity convention:
        # every slab comparison false => unreachable)
        empty = glo[:, 0] > ghi[:, 0]
        nan = jnp.float32(jnp.nan)
        return (jnp.where(empty[:, None], nan, glo),
                jnp.where(empty[:, None], nan, ghi))

    cmin, cmax = _boxes(tmin, tmax, C)
    smin, smax = _boxes(tmin, tmax, C * SUBS_PER_CLUSTER)
    return ClusterSet(woop=woop, woop_t=_transpose_woop(woop, jnp),
                      prim_index=order,
                      cluster_min=cmin, cluster_max=cmax,
                      sub_min=smin, sub_max=smax)


@partial(jax.jit, static_argnames=("method",))
def rebuild_clusters(clusters: ClusterSet, tri_vertices,
                     method: str = "median") -> ClusterSet:
    """Device-side REBUILD: fresh partition + refit, fully jittable.

    The per-file buildGAS analog (reference builds new GAS sets per
    animation file, src/Global/RendererMesh.cu:93-167) for animation
    series where geometry changes every file: a host `build_clusters`
    costs a D2H fetch + host sort + H2D per file, which dominates short
    files; this one keeps everything on device.

    method: "median" (default) = jittable median-split partition
    (:func:`_median_order_device` — SAH-class cull quality, ~log2(C)
    in-jit sorts); "morton" = single Morton sort (cheapest rebuild,
    2-3x worse cluster boxes)."""
    n = tri_vertices.shape[0]
    n_pad = clusters.woop.shape[0]
    tv = jnp.asarray(tri_vertices, jnp.float32)
    cents = jnp.mean(tv, axis=1)
    if method == "median":
        order = _median_order_device(cents)
    elif method == "morton":
        codes = morton_codes(cents, jnp.min(tv, axis=(0, 1)),
                             jnp.max(tv, axis=(0, 1)))
        order = jnp.argsort(codes).astype(jnp.int32)
    else:
        raise ValueError(f"unknown cluster rebuild method: {method!r}")
    order_pad = jnp.concatenate(
        [order, jnp.zeros(n_pad - n, jnp.int32)]) if n_pad > n else order
    return refit_clusters(
        dataclasses.replace(clusters, prim_index=order_pad), tv)
