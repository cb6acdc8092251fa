"""All-in-Pallas block marcher — the fused nearest-hit kernel.

One kernel performs the ENTIRE query for a W-ray block per grid step
(W = 128..512 lanes, chosen by VMEM budget — wider blocks amortize the
per-visit scalar sync and the 32 KB cluster DMA over more rays):

1. cull: slab-test all rays against ALL cluster AABBs -> a (C, W) entry
   matrix in VMEM;
2. march: a scalar while-loop picks the nearest cluster any ray still
   needs (block-min entry, masked by per-ray best_t), DMAs its 512
   Morton-sorted transposed Woop rows (32 KB) from HBM into VMEM
   (double-buffered: the next candidate prefetches while the current one
   is tested), and
3. tests the whole cluster densely: 6 lhs-transposed (4,512)x(4,W)
   MXU matmuls (the homogeneous -1 origin row folds the Woop translation
   into the dot) + VPU masking/reduction for the winner.

SCALAR-SYNC RULE (measured: per-visit cost is dominated by scalar
reductions, not DMA bytes — shrinking the cluster DMA 8x moved nothing):
the march body performs exactly TWO scalar reductions per visit (min
entry, then argmin cluster).  A single-reduction packed (entry bits |
cid) pick exists behind PICK_MODE="packed" but HALTS real TPUs at scene
scale (device FailedPrecondition; fine in interpret mode and in isolated
micro-kernels) — do not enable it on hardware without re-validating.

LAYOUT RULE (Mosaic-friendliness): rays live on the LANE axis everywhere —
rays are passed transposed (8, W) per block, cluster/triangle quantities on
the sublane axis, per-ray state as (1, W) rows.  No 1-D values, no
transposes, no cross-layout concatenations.

Nothing leaves the chip between passes: no XLA sorts, no host round trips,
no dispatch overhead (PERF.md cost model).  Exactness: the march continues
until no unvisited cluster has entry < best_t for ANY ray in the block —
the same termination criterion as per-ray BVH traversal, block-wide.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optix_ray_tracer_tpu.ops.sweep import CHUNK as _SWEEP_CHUNK
from optix_ray_tracer_tpu.ops.sweep import SUBS_PER_CLUSTER as _SWEEP_SUBS
from optix_ray_tracer_tpu.utils.vecmath import INF

BLOCK_RAYS = 128         # minimum block granularity callers pad to
CLUSTER_TRIS = _SWEEP_CHUNK   # == ops.sweep.CHUNK * WINDOW_CHUNKS
                              # (post-SAH retune — see ops.sweep.CHUNK;
                              # follows the ORT_CHUNK sweep knob)

_CID_BITS = 12           # low mantissa bits carrying the cluster id
_CID_MASK = (1 << _CID_BITS) - 1
_INF_BITS = 0x7F800000   # bit pattern of float32 +inf

# debug knobs (bisecting Mosaic device faults): pick implementation and
# triangle-test granularity
PICK_MODE = "float"      # "float" (2 syncs) | "packed" (1 sync; HANGS real
                         # TPUs — repro + status: docs/libtpu-packed-pick-bug.md)

# The FLOAT pick (production) never packs cluster ids into mantissa bits,
# so its cluster cap is a cost/VMEM bound, not an encoding bound; only the
# quarantined packed pick is limited to 2**_CID_BITS ids.  8192 keeps the
# 2M-triangle ceiling at 256-tri clusters (scenes past HIER_MIN_CLUSTERS
# take the hierarchical kernel, whose cull is O(C/GROUP) per visit).
MAX_CLUSTERS = 8192 if PICK_MODE == "float" else (1 << _CID_BITS)
N_SUBS = _SWEEP_SUBS     # second-level cull granularity (1 = off); gates
                         # each 64-tri sub-block on any(sub entry < best_t)
N_SUBS_INCOHERENT = 2    # incoherent waves pair-merge the sub boxes at
                         # trace time: their blocks visit many clusters, so
                         # per-visit gate rows cost more than the finer
                         # boxes save (measured, PERF.md round-3
                         # "cluster-constant re-sweep")

# The kernel indexes sub_min/sub_max rows as cur_c * n_subs + part, so the
# sub-box row layout built by ops.sweep MUST agree with the constants here;
# retuning either module alone would silently skip sub-blocks with true hits.
assert CLUSTER_TRIS == _SWEEP_CHUNK, (CLUSTER_TRIS, _SWEEP_CHUNK)
assert N_SUBS == _SWEEP_SUBS, (N_SUBS, _SWEEP_SUBS)
assert N_SUBS % N_SUBS_INCOHERENT == 0, (N_SUBS, N_SUBS_INCOHERENT)
# NOTE: sub-culling is LAZY (per-visit slab of the visited cluster's
# n_subs boxes) since round 3 — no per-cluster VMEM scratch, no scale cap


def choose_block_rays(n_clusters: int, coherent: bool = True) -> int:
    """Block width by wave coherence.  Measured on-chip under SAH
    partitioning (100k-tri bench, primary+shadow / 1M random rays):

    | W | coherent | incoherent |
    |---|---|---|
    | 128 | 16.10 | **3.36** |
    | 256 | 19.31 | 3.06 |
    | 512 | **20.54** | 2.34 |
    | 1024 | 21.96-22.13 vs 22.21 at 512 (post-retune re-check) | — |

    Coherent waves share their cluster set, so wider blocks amortize the
    per-visit scalar syncs at no extra visits; incoherent unions grow
    ~linearly with W, so width buys nothing and costs VPU time.  (The
    round-2 Morton-era sweep read the opposite for coherent waves —
    Morton's overlapping boxes made even camera-ray unions grow with W.)
    VMEM: the flat kernel's (c_pad, W) entry scratch must stay <= ~3 MB,
    so coherent waves narrow from W=512 as cluster counts grow (the
    hierarchical kernel normally takes over at HIER_MIN_CLUSTERS, but
    explicit block_rays/max_visits callers can reach the flat kernel at
    any C)."""
    if not coherent:
        return BLOCK_RAYS
    c_pad = ((n_clusters + 7) // 8) * 8
    for w in (512, 256):
        if c_pad * w * 4 <= 3 * 1024 * 1024:
            return w
    return BLOCK_RAYS


# slab-cull row chunk: the pass materializes ~5 (rows, W) f32 temporaries
# on the Mosaic VMEM stack; unchunked, a 1950-cluster scene's sub-box pass
# (7808 rows) needs ~22 MB of stack and fails to compile (16 MB VMEM).
_CULL_ROWS = 512


def _slab_rows(boxes, rays, inv_d, tmin, n_rows, n_valid, W,
               row_offset: int = 0):
    """Entry values for (n_rows, W) boxes-vs-rays; INF where missed.
    ``row_offset`` shifts the validity iota when culling a row chunk."""
    ent = jnp.full((n_rows, W), -INF, jnp.float32)
    ext = jnp.full((n_rows, W), INF, jnp.float32)
    for ax in range(3):
        t0 = (boxes[:, ax:ax + 1] - rays[ax:ax + 1, :]) * inv_d[ax:ax + 1, :]
        t1 = (boxes[:, 3 + ax:4 + ax] - rays[ax:ax + 1, :]) * inv_d[ax:ax + 1, :]
        ent = jnp.maximum(ent, jnp.minimum(t0, t1))
        ext = jnp.minimum(ext, jnp.maximum(t0, t1))
    ent = jnp.maximum(ent, tmin)
    rid = jax.lax.broadcasted_iota(jnp.int32, (n_rows, W), 0) + row_offset
    hit = (ent <= ext) & (rid < n_valid)
    return jnp.where(hit, ent, INF)


def _cull_into(entry_ref, boxes_ref, rays, inv_d, tmin, total_rows: int,
               n_valid: int, W: int):
    """Chunked slab cull: entry_ref[:] = slab(boxes) in _CULL_ROWS blocks,
    bounding the VMEM stack regardless of cluster count.

    The chunk loop must be a ROLLED ``fori_loop``: a Python-unrolled loop
    keeps every chunk's ~6 (rows, W) temporaries live on the Mosaic stack
    simultaneously (measured: 18-22 MB at 1950 clusters — compile OOM).
    Callers pad row counts to a _CULL_ROWS multiple when chunking.
    """
    if total_rows <= _CULL_ROWS:
        entry_ref[...] = _slab_rows(boxes_ref[...], rays, inv_d, tmin,
                                    total_rows, n_valid, W)
        return
    n_full = total_rows // _CULL_ROWS

    def body(i, _):
        r0 = pl.multiple_of(i * _CULL_ROWS, _CULL_ROWS)
        entry_ref[pl.ds(r0, _CULL_ROWS), :] = _slab_rows(
            boxes_ref[pl.ds(r0, _CULL_ROWS), :], rays, inv_d, tmin,
            _CULL_ROWS, n_valid, W, row_offset=r0)
        return 0

    jax.lax.fori_loop(0, n_full, body, 0)
    tail = total_rows - n_full * _CULL_ROWS
    if tail:     # one unrolled tail chunk (row counts are 8-aligned)
        r0 = n_full * _CULL_ROWS
        entry_ref[r0:r0 + tail, :] = _slab_rows(
            boxes_ref[r0:r0 + tail, :], rays, inv_d, tmin, tail,
            n_valid, W, row_offset=r0)


def _make_kernel(C_pad: int, n_clusters: int, max_visits: int,
                 any_hit: bool, W: int, n_subs: int,
                 instanced: bool = False, report_unresolved: bool = False):
    def kernel(rays_ref, boxes_ref, *rest):
        if instanced:
            # TLAS mode: rows of boxes/entries are (instance, library
            # cluster) PAIRS; pair_shape maps a pair to its library
            # cluster (the DMA index), pair_inst to its instance, whose
            # world->object affine rows live in inst_ref
            (pair_shape_ref, pair_inst_ref, inst_ref), rest = \
                rest[:3], rest[3:]
        if n_subs > 1:
            (sub_boxes_ref, woop_ref, out_ref, entry_ref,
             bt_ref, slot_ref, tri_scratch, sem) = rest
        else:
            (woop_ref, out_ref, entry_ref,
             bt_ref, slot_ref, tri_scratch, sem) = rest
        rays = rays_ref[...]                    # (8, W)
        inv_d = jnp.where(jnp.abs(rays[3:6, :]) > 1e-12,
                          1.0 / rays[3:6, :], 1e12)
        tmin = rays[6:7, :]
        bt0 = rays[7:8, :]

        # ---- cull (row-chunked; see _CULL_ROWS) ----
        _cull_into(entry_ref, boxes_ref, rays, inv_d, tmin,
                   C_pad, n_clusters, W)
        # second-level (SUB_TRIS-tri sub-block) culling is LAZY: computed per
        # VISIT from the visited cluster's (n_subs, 8) box block — a block
        # visits ~tens of clusters, so visit-time slab rows total far
        # fewer than the old upfront (C_pad * n_subs, W) matrix, whose
        # VMEM scratch also capped the cluster count (round-3 change)

        bt_ref[...] = bt0
        slot_ref[...] = jnp.full((1, W), -1.0, jnp.float32)

        hp = jax.lax.Precision.HIGHEST
        o_rows = rays[0:3, :]
        d_rows = rays[3:6, :]
        # homogeneous origin (4, W): the -1 row folds the Woop translation
        # into the transposed matmul (opx = r0.o - cx in ONE dot_general)
        o4 = jnp.concatenate(
            [o_rows, -jnp.ones((1, W), jnp.float32)], axis=0)
        dn_t = (((0,), (0,)), ((), ()))   # contract sublanes: lhs transposed
        cid_col = jax.lax.broadcasted_iota(jnp.int32, (C_pad, 1), 0)

        def pick(visited):
            """Nearest unvisited cluster any ray still needs."""
            bt = bt_ref[...]
            entry = entry_ref[...]
            block_entry = jnp.min(jnp.where(entry < bt, entry, INF),
                                  axis=1, keepdims=True)       # (C_pad, 1)
            key_f = jnp.where(visited < 0.5, block_entry, INF)
            if PICK_MODE == "float":
                kmin = jnp.min(key_f)
                c = jnp.min(jnp.where(key_f <= kmin, cid_col, C_pad))
                return c, kmin < INF
            bits = jax.lax.bitcast_convert_type(jnp.maximum(key_f, 0.0),
                                                jnp.int32)
            key = jnp.bitwise_or(
                jnp.bitwise_and(bits, ~jnp.int32(_CID_MASK)), cid_col)
            kmin = jnp.min(key)
            c = jnp.bitwise_and(kmin, jnp.int32(_CID_MASK))
            return c, kmin < _INF_BITS

        def start_dma(c, slot):
            lib_c = pair_shape_ref[c, 0] if instanced else c
            return pltpu.make_async_copy(
                woop_ref.at[lib_c], tri_scratch.at[slot], sem.at[slot])

        def cond(state):
            visit, _, _, cur_ok = state
            return (visit < max_visits) & cur_ok

        def body(state):
            # Double-buffered march: the CURRENT cluster's rows are already
            # in flight (DMA started last iteration); pick and prefetch the
            # NEXT candidate before waiting, so the test overlaps its DMA.
            visit, visited, cur_c, cur_ok = state
            slot = jax.lax.rem(visit, 2)
            visited = jnp.where(cid_col == cur_c, 1.0, visited)
            nxt_c, nxt_ok = pick(visited)

            @pl.when(nxt_ok)
            def _():
                start_dma(nxt_c, jax.lax.rem(visit + 1, 2)).start()

            @pl.when(cur_ok)
            def _():
                start_dma(cur_c, slot).wait()
                # (16, CLUSTER_TRIS) transposed Woop rows: 4-row groups
                # [r0|cx][r1|cy][r2|cz] (ops.sweep._WOOP_T_PERM), tested in
                # n_subs sub-blocks, each gated by its sub-box cull row
                # (single-row dynamic loads: Mosaic requires multi-row
                # dynamic sublane slices to be 8-aligned, cur_c*n_subs
                # is not)
                step = CLUSTER_TRIS // n_subs

                if instanced:
                    # rigid(+uniform scale) per-instance ray transform:
                    # o' = A (o - b), d' = A d with A = R^T / s.  t is the
                    # SAME parameter in both spaces (d' unnormalized), so
                    # tmin/best-t comparisons stay in world units.
                    iid = pair_inst_ref[cur_c, 0]
                    m = inst_ref[pl.ds(iid, 1), :]           # (1, 128)

                    def _mc(k):
                        return m[0:1, k:k + 1]               # (1, 1)

                    wx = rays[0:1, :] - _mc(9)
                    wy = rays[1:2, :] - _mc(10)
                    wz = rays[2:3, :] - _mc(11)
                    o4v = jnp.concatenate(
                        [_mc(0) * wx + _mc(1) * wy + _mc(2) * wz,
                         _mc(3) * wx + _mc(4) * wy + _mc(5) * wz,
                         _mc(6) * wx + _mc(7) * wy + _mc(8) * wz,
                         -jnp.ones((1, W), jnp.float32)], axis=0)
                    dx = rays[3:4, :]
                    dy = rays[4:5, :]
                    dz = rays[5:6, :]
                    d_v = jnp.concatenate(
                        [_mc(0) * dx + _mc(1) * dy + _mc(2) * dz,
                         _mc(3) * dx + _mc(4) * dy + _mc(5) * dz,
                         _mc(6) * dx + _mc(7) * dy + _mc(8) * dz], axis=0)
                else:
                    o4v = o4
                    d_v = d_rows

                def test_part(part):
                    ws = tri_scratch[slot, :,
                                     part * step:(part + 1) * step]
                    dot = partial(jax.lax.dot_general,
                                  dimension_numbers=dn_t, precision=hp,
                                  preferred_element_type=jnp.float32)
                    opx = dot(ws[0:4], o4v)
                    opy = dot(ws[4:8], o4v)
                    opz = dot(ws[8:12], o4v)
                    dpx = dot(ws[0:3], d_v)
                    dpy = dot(ws[4:7], d_v)
                    dpz = dot(ws[8:11], d_v)
                    safe = jnp.where(jnp.abs(dpz) > 1e-12, dpz, 1e-12)
                    t = -opz / safe
                    uu = opx + t * dpx
                    vv = opy + t * dpy
                    bt_cur = bt_ref[...]
                    ok = ((jnp.abs(dpz) > 1e-12) & (uu >= 0.0)
                          & (vv >= 0.0) & (uu + vv <= 1.0)
                          & (t > tmin) & (t < bt_cur))
                    t = jnp.where(ok, t, INF)
                    t_best = jnp.min(t, axis=0, keepdims=True)
                    closer = t_best < bt_cur
                    tri_row = jax.lax.broadcasted_iota(
                        jnp.int32, (step, W), 0)
                    # winner = LOWEST index with t == t_best (the oracle's
                    # tie rule); u/v for the winner are recomputed OUTSIDE
                    # the kernel from its Woop row — keeping per-sub work
                    # to two reductions
                    li = jnp.min(
                        jnp.where(t <= t_best, tri_row, step),
                        axis=0, keepdims=True)
                    slotf = (cur_c * CLUSTER_TRIS + part * step
                             + li).astype(jnp.float32)
                    slot_new = jnp.where(closer, slotf, slot_ref[...])
                    if any_hit:
                        # occlusion query: a ray with ANY hit stops
                        # needing clusters (entry < bt becomes false)
                        bt_ref[...] = jnp.where(slot_new >= 0.0, -INF,
                                                jnp.where(closer, t_best,
                                                          bt_cur))
                    else:
                        bt_ref[...] = jnp.where(closer, t_best, bt_cur)
                    slot_ref[...] = slot_new

                if n_subs > 1:
                    # lazy sub-cull: slab-test THIS cluster's n_subs
                    # sub-boxes now (world-space rows; NaN padding rows
                    # yield INF entries)
                    ent4 = _slab_rows(sub_boxes_ref[cur_c], rays, inv_d,
                                      tmin, n_subs, n_subs, W)
                for part in range(n_subs):
                    if n_subs > 1:
                        row = ent4[part:part + 1, :]

                        @pl.when(jnp.any(row < bt_ref[...]))
                        def _(part=part):
                            test_part(part)
                    else:
                        test_part(part)

            return visit + 1, visited, nxt_c, nxt_ok

        # prime the pipeline: pick + DMA the first cluster
        c0, ok0 = pick(jnp.zeros((C_pad, 1), jnp.float32))

        @pl.when(ok0)
        def _():
            start_dma(c0, 0).start()

        final = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros((C_pad, 1), jnp.float32), c0, ok0))

        # drain: a visit-cap exit (max_visits < C+1) leaves the prefetched
        # DMA for the NEXT cluster in flight with no waiter — ending the
        # kernel with an outstanding copy halts the device
        visit_f, _, cur_c_f, cur_ok_f = final

        @pl.when(cur_ok_f)
        def _():
            start_dma(cur_c_f, jax.lax.rem(visit_f, 2)).wait()

        out_ref[0, 0:1, :] = bt_ref[...]
        out_ref[0, 1:2, :] = slot_ref[...]
        if report_unresolved:
            # a ray is UNRESOLVED iff some cluster it still needs (entry <
            # best_t) was never visited — happens only when the visit cap
            # cut the march short.  `visited` omits the in-flight cur_c on
            # a cap exit, which errs conservative (ray re-marches later).
            visited_f = final[1]
            needs = jnp.any((entry_ref[...] < bt_ref[...])
                            & (visited_f < 0.5), axis=0, keepdims=True)
            out_ref[0, 2:3, :] = needs.astype(jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("c_pad", "n_clusters",
                                   "max_visits", "any_hit", "w", "n_subs",
                                   "instanced", "report_unresolved"))
def _march_call(rays_packed_t, boxes, sub_boxes, woop, c_pad: int,
                n_clusters: int, max_visits: int,
                any_hit: bool = False, w: int = BLOCK_RAYS,
                n_subs: int = 1, instanced: bool = False,
                pair_shape=None, pair_inst=None, inst_rows=None,
                report_unresolved: bool = False):
    """rays_packed_t: (8, R) transposed ray state, R % w == 0."""
    nb = rays_packed_t.shape[1] // w
    n_rows = 3 if report_unresolved else 2
    kernel = _make_kernel(c_pad, n_clusters, max_visits, any_hit, w,
                          n_subs, instanced, report_unresolved)
    in_specs = [
        pl.BlockSpec((8, w), lambda b: (0, b), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),           # cluster boxes
    ]
    inputs = [rays_packed_t, boxes]
    if instanced:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pair -> lib cluster
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pair -> instance
            pl.BlockSpec(memory_space=pltpu.VMEM),   # instance affines
        ]
        inputs += [pair_shape, pair_inst, inst_rows]
    if n_subs > 1:
        # (c_pad, n_subs, 8): one cluster's sub-boxes load as a single
        # leading-axis index (the lazy per-visit sub-cull)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # sub boxes
        inputs.append(sub_boxes)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # woop_t in HBM
    inputs.append(woop)
    scratch = [pltpu.VMEM((c_pad, w), jnp.float32)]      # cluster entries
    scratch += [
        pltpu.VMEM((1, w), jnp.float32),                 # best t
        pltpu.VMEM((1, w), jnp.float32),                 # best slot (f32)
        pltpu.VMEM((2, 16, CLUSTER_TRIS), jnp.float32),  # double buffer
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, n_rows, w), jnp.float32),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_rows, w), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=jax.default_backend() == "cpu",
    )(*inputs)


GROUP = 8   # clusters per supercluster in the hierarchical march

# block_march delegates COHERENT waves to the hierarchical kernel at
# large cluster counts; incoherent waves stay on the flat kernel at every
# size (it won both measured points: 2.04 vs 0.77 Mrays/s at 1954
# clusters, 1.35 vs 0.64 at 3907 — hier's lazy cluster/sub slabs repeat
# per visit, and incoherent blocks visit many sups).  Coherent crossover
# re-measured post-SAH at CHUNK=256 (PERF.md round-3 "flat/hier
# crossover"): flat wins at 1954 clusters (10.60 vs 5.9), hier at 3907
# (5.8 vs 4.77).
HIER_MIN_CLUSTERS = 3072


def _make_hier_kernel(S_pad: int, C_pad: int, n_clusters: int,
                      max_visits: int, any_hit: bool, W: int, n_subs: int):
    """Hierarchical block march: cull + pick over 8-cluster SUPERCLUSTERS,
    cluster and sub-block entries computed lazily per visit.

    Rationale (round 3): the flat kernel's upfront cull and per-visit pick
    are both O(C_pad) — at 1950 clusters (1M tris) they dominate.  Sup
    rows are C_pad/8, and one pick now serves up to 8 cluster tests.
    Exactness: sup entry <= min(entry of contained clusters), so the
    "no unvisited sup with entry < best_t" termination covers every
    cluster the flat criterion would; per-cluster tests stay gated by
    their true (lazily computed) entries.
    """
    def kernel(rays_ref, sup_boxes_ref, boxes_ref, sub_boxes_ref, woop_ref,
               out_ref, entry_ref, bt_ref, slot_ref, tri_scratch, sem):
        rays = rays_ref[...]
        inv_d = jnp.where(jnp.abs(rays[3:6, :]) > 1e-12,
                          1.0 / rays[3:6, :], 1e12)
        tmin = rays[6:7, :]
        bt_ref[...] = rays[7:8, :]
        slot_ref[...] = jnp.full((1, W), -1.0, jnp.float32)

        n_sup = (n_clusters + GROUP - 1) // GROUP
        _cull_into(entry_ref, sup_boxes_ref, rays, inv_d, tmin,
                   S_pad, n_sup, W)

        hp = jax.lax.Precision.HIGHEST
        d_rows = rays[3:6, :]
        o4 = jnp.concatenate(
            [rays[0:3, :], -jnp.ones((1, W), jnp.float32)], axis=0)
        dn_t = (((0,), (0,)), ((), ()))
        sid_col = jax.lax.broadcasted_iota(jnp.int32, (S_pad, 1), 0)

        def pick(visited):
            bt = bt_ref[...]
            entry = entry_ref[...]
            block_entry = jnp.min(jnp.where(entry < bt, entry, INF),
                                  axis=1, keepdims=True)
            key_f = jnp.where(visited < 0.5, block_entry, INF)
            kmin = jnp.min(key_f)
            s = jnp.min(jnp.where(key_f <= kmin, sid_col, S_pad))
            return s, kmin < INF

        def start_dma(c, slot):
            # clamp: the last sup's trailing slots may exceed the real
            # cluster count; their NaN boxes gate the tests off anyway
            c = jnp.minimum(c, n_clusters - 1)
            return pltpu.make_async_copy(
                woop_ref.at[c], tri_scratch.at[slot], sem.at[slot])

        def cond(state):
            visit, _, _, cur_ok = state
            return (visit < max_visits) & cur_ok

        def body(state):
            visit, visited, cur_s, cur_ok = state
            visited = jnp.where(sid_col == cur_s, 1.0, visited)
            nxt_s, nxt_ok = pick(visited)

            @pl.when(cur_ok)
            def _():
                base_c = cur_s * GROUP
                # lazy cluster entries for this sup (8-aligned dynamic
                # row slice)
                cent = _slab_rows(boxes_ref[pl.ds(base_c, GROUP), :],
                                  rays, inv_d, tmin, GROUP, GROUP, W)
                start_dma(base_c, 0).start()
                step = CLUSTER_TRIS // n_subs

                def test_part(cur_c, slot, part):
                    ws = tri_scratch[slot, :,
                                     part * step:(part + 1) * step]
                    dot = partial(jax.lax.dot_general,
                                  dimension_numbers=dn_t, precision=hp,
                                  preferred_element_type=jnp.float32)
                    opx = dot(ws[0:4], o4)
                    opy = dot(ws[4:8], o4)
                    opz = dot(ws[8:12], o4)
                    dpx = dot(ws[0:3], d_rows)
                    dpy = dot(ws[4:7], d_rows)
                    dpz = dot(ws[8:11], d_rows)
                    safe = jnp.where(jnp.abs(dpz) > 1e-12, dpz, 1e-12)
                    t = -opz / safe
                    uu = opx + t * dpx
                    vv = opy + t * dpy
                    bt_cur = bt_ref[...]
                    ok = ((jnp.abs(dpz) > 1e-12) & (uu >= 0.0)
                          & (vv >= 0.0) & (uu + vv <= 1.0)
                          & (t > tmin) & (t < bt_cur))
                    t = jnp.where(ok, t, INF)
                    t_best = jnp.min(t, axis=0, keepdims=True)
                    closer = t_best < bt_cur
                    tri_row = jax.lax.broadcasted_iota(
                        jnp.int32, (step, W), 0)
                    li = jnp.min(
                        jnp.where(t <= t_best, tri_row, step),
                        axis=0, keepdims=True)
                    slotf = (cur_c * CLUSTER_TRIS + part * step
                             + li).astype(jnp.float32)
                    slot_new = jnp.where(closer, slotf, slot_ref[...])
                    if any_hit:
                        bt_ref[...] = jnp.where(slot_new >= 0.0, -INF,
                                                jnp.where(closer, t_best,
                                                          bt_cur))
                    else:
                        bt_ref[...] = jnp.where(closer, t_best, bt_cur)
                    slot_ref[...] = slot_new

                for i in range(GROUP):
                    if i + 1 < GROUP:
                        start_dma(base_c + i + 1,
                                  jnp.int32((i + 1) % 2)).start()
                    start_dma(base_c + i, jnp.int32(i % 2)).wait()

                    @pl.when(jnp.any(cent[i:i + 1, :] < bt_ref[...]))
                    def _(i=i):
                        cur_c = base_c + i
                        ent4 = _slab_rows(sub_boxes_ref[cur_c], rays,
                                          inv_d, tmin, n_subs, n_subs, W)
                        for part in range(n_subs):
                            @pl.when(jnp.any(ent4[part:part + 1, :]
                                             < bt_ref[...]))
                            def _(part=part):
                                test_part(cur_c, jnp.int32(i % 2), part)

            return visit + 1, visited, nxt_s, nxt_ok

        s0, ok0 = pick(jnp.zeros((S_pad, 1), jnp.float32))
        jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros((S_pad, 1), jnp.float32), s0, ok0))

        out_ref[0, 0:1, :] = bt_ref[...]
        out_ref[0, 1:2, :] = slot_ref[...]

    return kernel


@partial(jax.jit, static_argnames=("s_pad", "c_pad", "n_clusters",
                                   "max_visits", "any_hit", "w", "n_subs"))
def _hier_call(rays_packed_t, sup_boxes, boxes, sub_boxes, woop,
               s_pad: int, c_pad: int, n_clusters: int, max_visits: int,
               any_hit: bool = False, w: int = BLOCK_RAYS,
               n_subs: int = N_SUBS):
    nb = rays_packed_t.shape[1] // w
    kernel = _make_hier_kernel(s_pad, c_pad, n_clusters, max_visits,
                               any_hit, w, n_subs)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, 2, w), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, w), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sup boxes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cluster boxes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sub boxes (3D)
            pl.BlockSpec(memory_space=pl.ANY),       # woop_t in HBM
        ],
        out_specs=pl.BlockSpec((1, 2, w), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((s_pad, w), jnp.float32),     # sup entries
            pltpu.VMEM((1, w), jnp.float32),         # best t
            pltpu.VMEM((1, w), jnp.float32),         # best slot
            pltpu.VMEM((2, 16, CLUSTER_TRIS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() == "cpu",
    )(rays_packed_t, sup_boxes, boxes, sub_boxes, woop)


def block_march_hier(clusters, o, d, t_min, t_max, any_hit: bool = False,
                     coherent: bool = True):
    """Hierarchical (supercluster) variant of :func:`block_march` — same
    contract, same exact results; profitable at large cluster counts
    where the flat kernel's O(C) cull/pick dominates (see PERF.md)."""
    C = clusters.num_clusters
    c_pad = ((C + 7) // 8) * 8
    boxes = _pad_boxes(clusters.cluster_min, clusters.cluster_max,
                       c_pad - C)
    S = c_pad // GROUP
    s_pad = ((S + 7) // 8) * 8
    # sup box = NaN-aware union of its 8 cluster boxes (padded clusters
    # keep NaN boxes, so pure-padding sups can never be picked)
    gmin = jnp.nanmin(boxes[:, 0:3].reshape(S, GROUP, 3), axis=1)
    gmax = jnp.nanmax(boxes[:, 3:6].reshape(S, GROUP, 3), axis=1)
    sup_boxes = _pad_boxes(gmin, gmax, s_pad - S)
    sub_boxes, n_subs = _wave_sub_boxes(clusters, c_pad, coherent)
    if sub_boxes is None:
        sub_boxes = boxes

    # W=128 always: wide blocks were measured 2x SLOWER here (1M tris
    # coherent, W=512: 2.89 vs 5.8 Mrays/s at W=128) — at hier scales the
    # block's sup-level union grows with W just like the incoherent flat
    # case, so width only buys sync count it then loses in visits
    W = BLOCK_RAYS
    n = o.shape[0]
    pad = (-n) % W
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)))
        d = d.at[n:, 2].set(1.0)
        t_min = jnp.pad(t_min, (0, pad), constant_values=1.0)
        t_max = jnp.pad(t_max, (0, pad), constant_values=0.0)
    t_max = jnp.minimum(t_max, INF)
    rays_packed_t = jnp.concatenate(
        [o.T, d.T, t_min[None, :], t_max[None, :]], axis=0)
    out = _hier_call(rays_packed_t, sup_boxes, boxes, sub_boxes,
                     clusters.woop_t, s_pad=s_pad, c_pad=c_pad,
                     n_clusters=C, max_visits=S + 1, any_hit=any_hit,
                     w=W, n_subs=n_subs)
    out = jnp.swapaxes(out, 1, 2).reshape(-1, 2)[:n]
    t = out[:, 0]
    slotf = out[:, 1]
    miss = slotf < 0.0
    slot = jnp.where(miss, -1, slotf.astype(jnp.int32))
    t = jnp.where(miss, INF, t)
    if any_hit:
        return t, slot, jnp.zeros_like(t), jnp.zeros_like(t)
    w_rows = clusters.woop[jnp.maximum(slot, 0)]
    o_h = o[:n]
    d_h = d[:n]
    t_safe = jnp.where(miss, 0.0, t)
    u = (jnp.einsum("ri,ri->r", w_rows[:, 0:3], o_h) - w_rows[:, 9]
         + t_safe * jnp.einsum("ri,ri->r", w_rows[:, 0:3], d_h))
    v = (jnp.einsum("ri,ri->r", w_rows[:, 3:6], o_h) - w_rows[:, 10]
         + t_safe * jnp.einsum("ri,ri->r", w_rows[:, 3:6], d_h))
    return (t, slot, jnp.where(miss, 0.0, u), jnp.where(miss, 0.0, v))


def _make_probe_kernel(C_pad: int, n_clusters: int, W: int):
    def kernel(rays_ref, boxes_ref, out_ref):
        rays = rays_ref[...]
        inv_d = jnp.where(jnp.abs(rays[3:6, :]) > 1e-12,
                          1.0 / rays[3:6, :], 1e12)
        # row-chunked like the march cull, as a ROLLED loop (an unrolled
        # chunk loop keeps every chunk's slab temporaries on the Mosaic
        # VMEM stack at once — compile OOM at ~2000 clusters); ties
        # resolve to the lowest cluster id because chunks ascend
        def chunk_min(r0, rows, emin, first):
            entry = _slab_rows(boxes_ref[pl.ds(r0, rows), :], rays, inv_d,
                               rays[6:7, :], rows, n_clusters, W,
                               row_offset=r0)
            entry = jnp.where(entry < rays[7:8, :], entry, INF)
            cmin = jnp.min(entry, axis=0, keepdims=True)      # (1, W)
            cid = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 0) + r0
            cfirst = jnp.min(jnp.where(entry <= cmin, cid, C_pad),
                             axis=0, keepdims=True)
            return jnp.minimum(emin, cmin), jnp.where(cmin < emin,
                                                      cfirst, first)

        emin = jnp.full((1, W), INF, jnp.float32)
        first = jnp.full((1, W), C_pad, jnp.int32)
        if C_pad <= _CULL_ROWS:
            emin, first = chunk_min(0, C_pad, emin, first)
        else:
            n_full = C_pad // _CULL_ROWS

            def body(i, carry):
                r0 = pl.multiple_of(i * _CULL_ROWS, _CULL_ROWS)
                return chunk_min(r0, _CULL_ROWS, *carry)

            emin, first = jax.lax.fori_loop(0, n_full, body, (emin, first))
            tail = C_pad - n_full * _CULL_ROWS
            if tail:
                emin, first = chunk_min(n_full * _CULL_ROWS, tail,
                                        emin, first)
        out_ref[0, :, :] = jnp.where(emin < INF, first, C_pad)

    return kernel


@partial(jax.jit, static_argnames=("c_pad", "n_clusters", "w"))
def _probe_call(rays_packed_t, boxes, c_pad: int, n_clusters: int, w: int):
    nb = rays_packed_t.shape[1] // w
    return pl.pallas_call(
        _make_probe_kernel(c_pad, n_clusters, w),
        out_shape=jax.ShapeDtypeStruct((nb, 1, w), jnp.int32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, w), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, w), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(rays_packed_t, boxes)


def probe_first_cluster(clusters, o, d, t_min, t_max):
    """Per-ray id of the nearest cluster the ray enters (C_pad if none) —
    a cheap cull-only pass used to coherence-sort INCOHERENT wavefronts:
    grouping rays by where their traversal starts (origin AND direction
    jointly) shrinks the block-union of needed clusters far more than a
    positional Morton key can (see ops.march.ray_probe_keys)."""
    C = clusters.num_clusters
    c_pad = ((C + 7) // 8) * 8
    boxes = _pad_boxes(clusters.cluster_min, clusters.cluster_max, c_pad - C)
    n = o.shape[0]
    W = BLOCK_RAYS
    pad = (-n) % W
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)))
        d = d.at[n:, 2].set(1.0)
        t_min = jnp.pad(t_min, (0, pad), constant_values=1.0)
        t_max = jnp.pad(t_max, (0, pad), constant_values=0.0)
    t_max = jnp.minimum(t_max, INF)
    rays_packed_t = jnp.concatenate(
        [o.T, d.T, t_min[None, :], t_max[None, :]], axis=0)
    out = _probe_call(rays_packed_t, boxes, c_pad=c_pad, n_clusters=C, w=W)
    return out.reshape(-1)[:n]


def _pad_boxes(bmin, bmax, pad):
    if pad:
        nan = jnp.full((pad, 3), jnp.nan, jnp.float32)
        bmin = jnp.concatenate([bmin, nan], 0)
        bmax = jnp.concatenate([bmax, nan], 0)
    return jnp.concatenate(
        [bmin, bmax, jnp.zeros((bmin.shape[0], 2), jnp.float32)], axis=1)


def _wave_sub_boxes(clusters, c_pad: int, coherent: bool):
    """(sub_boxes, n_subs) for the wave's coherence class.

    Incoherent waves use pair-merged sub boxes (N_SUBS_INCOHERENT rows):
    their blocks visit many clusters, so the per-visit sub-slab rows cost
    more than the finer gates save.  The merge is a trace-time nan-union
    of the build's N_SUBS boxes (all-padding sub-slots are NaN, same
    convention as the supercluster union in block_march_hier)."""
    C = clusters.num_clusters
    n_subs = N_SUBS if coherent else N_SUBS_INCOHERENT
    if n_subs <= 1:
        return None, 1
    sub_min, sub_max = clusters.sub_min, clusters.sub_max
    if n_subs != N_SUBS:
        f = N_SUBS // n_subs
        sub_min = jnp.nanmin(sub_min.reshape(C, n_subs, f, 3),
                             axis=2).reshape(C * n_subs, 3)
        sub_max = jnp.nanmax(sub_max.reshape(C, n_subs, f, 3),
                             axis=2).reshape(C * n_subs, 3)
    sub_boxes = _pad_boxes(sub_min, sub_max,
                           (c_pad - C) * n_subs).reshape(c_pad, n_subs, 8)
    return sub_boxes, n_subs


def block_march(clusters, o, d, t_min, t_max, any_hit: bool = False,
                block_rays: int | None = None,
                max_visits: int | None = None,
                report_unresolved: bool = False,
                coherent: bool = True):
    """Nearest-hit (or, with ``any_hit``, occlusion) query via the fused
    kernel.

    clusters: ops.sweep.ClusterSet; o, d (R, 3) with R % 128 == 0;
    t bounds (R,).  Rays must already be coherence-sorted by the caller.
    ``block_rays`` overrides the auto-sized block width (wider = fewer
    scalar syncs per ray; more union divergence).
    Returns (t, slot, u, v); slot indexes the sorted prim arrays (-1 miss).
    With ``any_hit`` only slot's hit/miss distinction is meaningful.

    ``max_visits`` caps per-block cluster visits (default: exact, C+1);
    with a cap, results are exact ONLY for rays the kernel resolved —
    pass ``report_unresolved=True`` to get a 5th return, a bool mask of
    rays whose march was cut short (the two-pass speculative scheme:
    resolve most rays in k visits, re-march the compacted remainder).

    Tie semantics: when two triangles are hit at EXACTLY equal t, the
    winner is the first one tested (visit order) — the flat and
    hierarchical kernels may disagree on such rays (~1 per million on
    tessellated meshes, measured); both answers are valid nearest hits.
    """
    C = clusters.num_clusters
    if C > MAX_CLUSTERS:
        raise ValueError(
            f"scene has {C} clusters; the marcher caps at {MAX_CLUSTERS} "
            f"clusters = {MAX_CLUSTERS * CLUSTER_TRIS} triangles "
            f"(cost/VMEM bound of the cull; the packed pick additionally "
            f"caps at {1 << _CID_BITS} id bits) — raise CHUNK")
    if (C >= HIER_MIN_CLUSTERS and coherent and block_rays is None
            and max_visits is None and not report_unresolved):
        # large scenes, coherent waves only: the hierarchical kernel wins
        # once the flat kernel's O(C) cull/pick dominates (crossover
        # measured on-chip; incoherent waves keep the flat kernel at
        # every size — see HIER_MIN_CLUSTERS)
        return block_march_hier(clusters, o, d, t_min, t_max,
                                any_hit=any_hit, coherent=coherent)
    c_pad = ((C + 7) // 8) * 8
    boxes = _pad_boxes(clusters.cluster_min, clusters.cluster_max, c_pad - C)

    W = block_rays or choose_block_rays(C, coherent)
    # the lazy per-visit sub-cull has no per-cluster VMEM scratch, so
    # sub-culling stays on at EVERY scene size (the old upfront
    # (C_pad * N_SUBS, W) entry matrix degraded to whole-cluster tests
    # past ~3000 clusters)
    sub_boxes, n_subs = _wave_sub_boxes(clusters, c_pad, coherent)
    if sub_boxes is None:
        sub_boxes = boxes
    n = o.shape[0]
    pad = (-n) % W
    if pad:
        # dead-ray padding: t_max=0 keeps padded lanes out of every pick
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)))
        d = d.at[n:, 2].set(1.0)
        t_min = jnp.pad(t_min, (0, pad), constant_values=1.0)
        t_max = jnp.pad(t_max, (0, pad), constant_values=0.0)

    # INF (1e16) is the kernel's miss sentinel: a larger t_max (e.g. a
    # caller passing float inf) would make sentinel entries look "needed"
    # and INF-t triangle misses look like hits
    t_max = jnp.minimum(t_max, INF)
    rays_packed_t = jnp.concatenate(
        [o.T, d.T, t_min[None, :], t_max[None, :]], axis=0)  # (8, R)
    n_rows = 3 if report_unresolved else 2
    out = _march_call(rays_packed_t, boxes, sub_boxes, clusters.woop_t,
                      c_pad=c_pad, n_clusters=C,
                      max_visits=(C + 1 if max_visits is None
                                  else max_visits),
                      any_hit=any_hit, w=W,
                      n_subs=n_subs, report_unresolved=report_unresolved)
    out = jnp.swapaxes(out, 1, 2).reshape(-1, n_rows)[:n]
    t = out[:, 0]
    slotf = out[:, 1]
    needs = (out[:, 2] > 0.5) if report_unresolved else None
    miss = slotf < 0.0
    slot = jnp.where(miss, -1, slotf.astype(jnp.int32))
    t = jnp.where(miss, INF, t)
    if any_hit:
        zeros = jnp.zeros_like(t)
        if report_unresolved:
            return t, slot, zeros, zeros, needs
        return t, slot, zeros, zeros
    # barycentrics for the winner, recomputed from its Woop row (one
    # (R, 12) gather) — cheaper than carrying u/v winner reductions
    # through every sub-block test inside the kernel
    w_rows = clusters.woop[jnp.maximum(slot, 0)]
    o_h = o[:n]
    d_h = d[:n]
    t_safe = jnp.where(miss, 0.0, t)   # keep INF out of the arithmetic
    u = (jnp.einsum("ri,ri->r", w_rows[:, 0:3], o_h) - w_rows[:, 9]
         + t_safe * jnp.einsum("ri,ri->r", w_rows[:, 0:3], d_h))
    v = (jnp.einsum("ri,ri->r", w_rows[:, 3:6], o_h) - w_rows[:, 10]
         + t_safe * jnp.einsum("ri,ri->r", w_rows[:, 3:6], d_h))
    u = jnp.where(miss, 0.0, u)
    v = jnp.where(miss, 0.0, v)
    if report_unresolved:
        return t, slot, u, v, needs
    return t, slot, u, v


def block_march_instanced(pair_min, pair_max, sub_min, sub_max,
                          pair_shape, pair_inst, inst_rows, lib_woop_t,
                          lib_woop, o, d, t_min, t_max,
                          any_hit: bool = False):
    """Instance-level (TLAS) nearest-hit query.

    The march is the same block-wide nearest-first loop as
    :func:`block_march`, but each cull row is an (instance, library
    cluster) PAIR: the DMA fetches the pair's OBJECT-space library
    cluster (geometry stored once per shape, reference RendererTime.cu:
    176-182), and the visit transforms the ray block into that
    instance's object space (rigid + uniform scale; reference per-frame
    IAS transforms, RendererImpl.cu:174-242).

    pair_min/pair_max: (Cp, 3) world AABBs per pair (refit per frame);
    sub_min/sub_max: (Cp*N_SUBS, 3) world sub-box AABBs;
    pair_shape/pair_inst: (Cp,) int32; inst_rows: (P, 128) float32 rows
    [A(9), b(3), 0...] of the world->object affine o' = A (o - b);
    lib_woop_t: (S_clusters, 16, CLUSTER_TRIS); lib_woop: flat (S*CHUNK,
    12) object-space rows for the post-march u/v recompute.

    Returns (t, slot, u, v): slot = pair * CLUSTER_TRIS + row (-1 miss);
    the caller maps slot -> (instance, library triangle).
    """
    C = pair_min.shape[0]
    if C > MAX_CLUSTERS:
        raise ValueError(f"{C} instance pairs exceed {MAX_CLUSTERS}")
    c_pad = ((C + 7) // 8) * 8
    boxes = _pad_boxes(pair_min, pair_max, c_pad - C)
    n_subs = N_SUBS
    if n_subs > 1:
        sub_boxes = _pad_boxes(sub_min, sub_max, (c_pad - C) * n_subs
                               ).reshape(c_pad, n_subs, 8)
    else:
        sub_boxes = boxes
    ps = jnp.pad(pair_shape.astype(jnp.int32),
                 (0, c_pad - C)).reshape(-1, 1)
    pi = jnp.pad(pair_inst.astype(jnp.int32),
                 (0, c_pad - C)).reshape(-1, 1)

    n = o.shape[0]
    W = BLOCK_RAYS
    pad = (-n) % W
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)))
        d = d.at[n:, 2].set(1.0)
        t_min = jnp.pad(t_min, (0, pad), constant_values=1.0)
        t_max = jnp.pad(t_max, (0, pad), constant_values=0.0)
    t_max = jnp.minimum(t_max, INF)
    rays_packed_t = jnp.concatenate(
        [o.T, d.T, t_min[None, :], t_max[None, :]], axis=0)
    out = _march_call(rays_packed_t, boxes, sub_boxes, lib_woop_t,
                      c_pad=c_pad, n_clusters=C, max_visits=C + 1,
                      any_hit=any_hit, w=W, n_subs=n_subs,
                      instanced=True, pair_shape=ps, pair_inst=pi,
                      inst_rows=inst_rows)
    out = jnp.swapaxes(out, 1, 2).reshape(-1, 2)[:n]
    t = out[:, 0]
    slotf = out[:, 1]
    miss = slotf < 0.0
    slot = jnp.where(miss, -1, slotf.astype(jnp.int32))
    t = jnp.where(miss, INF, t)
    if any_hit:
        return t, slot, jnp.zeros_like(t), jnp.zeros_like(t)
    # u/v for the winner: transform the ray into the winning instance's
    # object space, then evaluate its library Woop row (one (R, 12) +
    # one (R, 128) gather)
    pair = jnp.maximum(slot, 0) // CLUSTER_TRIS
    row = jnp.maximum(slot, 0) % CLUSTER_TRIS
    lib_slot = pair_shape[jnp.minimum(pair, C - 1)] * CLUSTER_TRIS + row
    w_rows = lib_woop[lib_slot]
    m = inst_rows[pair_inst[jnp.minimum(pair, C - 1)], :12]  # (R, 12)
    A = m[:, :9].reshape(-1, 3, 3)
    b = m[:, 9:12]
    o_obj = jnp.einsum("rij,rj->ri", A, o[:n] - b)
    d_obj = jnp.einsum("rij,rj->ri", A, d[:n])
    t_safe = jnp.where(miss, 0.0, t)
    u = (jnp.einsum("ri,ri->r", w_rows[:, 0:3], o_obj) - w_rows[:, 9]
         + t_safe * jnp.einsum("ri,ri->r", w_rows[:, 0:3], d_obj))
    v = (jnp.einsum("ri,ri->r", w_rows[:, 3:6], o_obj) - w_rows[:, 10]
         + t_safe * jnp.einsum("ri,ri->r", w_rows[:, 3:6], d_obj))
    return (t, slot, jnp.where(miss, 0.0, u), jnp.where(miss, 0.0, v))
