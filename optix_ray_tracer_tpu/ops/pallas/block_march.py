"""All-in-Pallas block marcher — the fused nearest-hit kernel.

One kernel performs the ENTIRE query for a 128-ray block per grid step:

1. cull: slab-test all rays against ALL cluster AABBs -> a (C, 128) entry
   matrix in VMEM;
2. march: a scalar while-loop picks the nearest cluster any ray still
   needs (block-min entry, masked by per-ray best_t), DMAs its 512
   Morton-sorted transposed Woop rows (32 KB) from HBM into VMEM
   (double-buffered: the next candidate prefetches while the current one
   is tested), and
3. tests the whole cluster densely: 6 lhs-transposed (4,512)x(4,128)
   MXU matmuls (the homogeneous -1 origin row folds the Woop translation
   into the dot) + VPU masking/reduction for the winner.

SCALAR-SYNC RULE (measured: per-visit cost is dominated by scalar
reductions, not DMA bytes — shrinking the cluster DMA 8x moved nothing):
the march body performs exactly ONE scalar reduction per visit.  ``pick``
packs (entry bits | cluster id) into one int32 key — non-negative fp32
bit patterns are order-isomorphic to int32, and stealing the low 12
mantissa bits only perturbs the HEURISTIC visit order, never correctness
— so block-min entry + argmin cluster + any-needed all come out of a
single ``jnp.min``.

LAYOUT RULE (Mosaic-friendliness): rays live on the LANE axis everywhere —
rays are passed transposed (8, B) per block, cluster/triangle quantities on
the sublane axis, per-ray state as (1, B) rows.  No 1-D values, no
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

from optix_ray_tracer_tpu.utils.vecmath import INF

BLOCK_RAYS = 128
CLUSTER_TRIS = 512       # == ops.sweep.CHUNK * WINDOW_CHUNKS

_CID_BITS = 12           # low mantissa bits carrying the cluster id
_CID_MASK = (1 << _CID_BITS) - 1
MAX_CLUSTERS = 1 << _CID_BITS
_INF_BITS = 0x7F800000   # bit pattern of float32 +inf

# debug knobs (bisecting Mosaic device faults): pick implementation and
# triangle-test granularity
PICK_MODE = "float"     # "packed" (1 scalar sync) | "float" (2 syncs)
TEST_SPLIT = 1           # sub-blocks per cluster test (1 = whole cluster)


def _slab_rows(boxes, rays, inv_d, tmin, n_rows, n_valid):
    """Entry values for (n_rows, B) boxes-vs-rays; INF where missed."""
    ent = jnp.full((n_rows, BLOCK_RAYS), -INF, jnp.float32)
    ext = jnp.full((n_rows, BLOCK_RAYS), INF, jnp.float32)
    for ax in range(3):
        t0 = (boxes[:, ax:ax + 1] - rays[ax:ax + 1, :]) * inv_d[ax:ax + 1, :]
        t1 = (boxes[:, 3 + ax:4 + ax] - rays[ax:ax + 1, :]) * inv_d[ax:ax + 1, :]
        ent = jnp.maximum(ent, jnp.minimum(t0, t1))
        ext = jnp.minimum(ext, jnp.maximum(t0, t1))
    ent = jnp.maximum(ent, tmin)
    rid = jax.lax.broadcasted_iota(jnp.int32, (n_rows, BLOCK_RAYS), 0)
    hit = (ent <= ext) & (rid < n_valid)
    return jnp.where(hit, ent, INF)


def _make_kernel(C_pad: int, n_clusters: int, max_visits: int,
                 any_hit: bool):
    def kernel(rays_ref, boxes_ref, woop_ref, out_ref,
               entry_ref, bt_ref, slot_ref, u_ref, v_ref,
               tri_scratch, sem):
        rays = rays_ref[...]                    # (8, B)
        inv_d = jnp.where(jnp.abs(rays[3:6, :]) > 1e-12,
                          1.0 / rays[3:6, :], 1e12)
        tmin = rays[6:7, :]
        bt0 = rays[7:8, :]

        # ---- cull ----
        entry_ref[...] = _slab_rows(boxes_ref[...], rays, inv_d, tmin,
                                    C_pad, n_clusters)

        bt_ref[...] = bt0
        slot_ref[...] = jnp.full((1, BLOCK_RAYS), -1.0, jnp.float32)
        u_ref[...] = jnp.zeros((1, BLOCK_RAYS), jnp.float32)
        v_ref[...] = jnp.zeros((1, BLOCK_RAYS), jnp.float32)

        hp = jax.lax.Precision.HIGHEST
        o_rows = rays[0:3, :]
        d_rows = rays[3:6, :]
        # homogeneous origin (4, B): the -1 row folds the Woop translation
        # into the transposed matmul (opx = r0.o - cx in ONE dot_general)
        o4 = jnp.concatenate(
            [o_rows, -jnp.ones((1, BLOCK_RAYS), jnp.float32)], axis=0)
        dn_t = (((0,), (0,)), ((), ()))   # contract sublanes: lhs transposed
        cid_col = jax.lax.broadcasted_iota(jnp.int32, (C_pad, 1), 0)

        def pick(visited):
            """Nearest unvisited cluster any ray still needs, via ONE
            scalar reduction of a packed (entry bits | cid) key."""
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
            kmin = jnp.min(key)                 # the visit's ONE scalar sync
            c = jnp.bitwise_and(kmin, jnp.int32(_CID_MASK))
            return c, kmin < _INF_BITS

        def start_dma(c, slot):
            return pltpu.make_async_copy(
                woop_ref.at[c], tri_scratch.at[slot], sem.at[slot])

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
                # [r0|cx][r1|cy][r2|cz] (ops.sweep._WOOP_T_PERM); the whole
                # cluster is tested unconditionally — gating sub-blocks on
                # jnp.any costs a scalar sync each, which outweighs the
                # saved VPU/MXU work
                step = CLUSTER_TRIS // TEST_SPLIT
                for part in range(TEST_SPLIT):
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
                        jnp.int32, (step, BLOCK_RAYS), 0)
                    li = jnp.min(
                        jnp.where(t <= t_best, tri_row, step),
                        axis=0, keepdims=True)
                    winner = tri_row == li
                    bu = jnp.max(jnp.where(winner, uu, -INF), axis=0,
                                 keepdims=True)
                    bv = jnp.max(jnp.where(winner, vv, -INF), axis=0,
                                 keepdims=True)
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
                    u_ref[...] = jnp.where(closer, bu, u_ref[...])
                    v_ref[...] = jnp.where(closer, bv, v_ref[...])

            return visit + 1, visited, nxt_c, nxt_ok

        # prime the pipeline: pick + DMA the first cluster
        c0, ok0 = pick(jnp.zeros((C_pad, 1), jnp.float32))

        @pl.when(ok0)
        def _():
            start_dma(c0, 0).start()

        jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros((C_pad, 1), jnp.float32), c0, ok0))

        out_ref[0, 0:1, :] = bt_ref[...]
        out_ref[0, 1:2, :] = slot_ref[...]
        out_ref[0, 2:3, :] = u_ref[...]
        out_ref[0, 3:4, :] = v_ref[...]

    return kernel


@partial(jax.jit, static_argnames=("c_pad", "n_clusters",
                                   "max_visits", "any_hit"))
def _march_call(rays_packed_t, boxes, woop, c_pad: int,
                n_clusters: int, max_visits: int,
                any_hit: bool = False):
    """rays_packed_t: (8, R) transposed ray state."""
    nb = rays_packed_t.shape[1] // BLOCK_RAYS
    kernel = _make_kernel(c_pad, n_clusters, max_visits, any_hit)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, 4, BLOCK_RAYS), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, BLOCK_RAYS), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),       # cluster boxes
            pl.BlockSpec(memory_space=pl.ANY),           # woop_t stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 4, BLOCK_RAYS), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c_pad, BLOCK_RAYS), jnp.float32),    # cluster entries
            pltpu.VMEM((1, BLOCK_RAYS), jnp.float32),        # best t
            pltpu.VMEM((1, BLOCK_RAYS), jnp.float32),        # best slot (f32)
            pltpu.VMEM((1, BLOCK_RAYS), jnp.float32),        # best u
            pltpu.VMEM((1, BLOCK_RAYS), jnp.float32),        # best v
            pltpu.VMEM((2, 16, CLUSTER_TRIS), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() == "cpu",
    )(rays_packed_t, boxes, woop)


def _pad_boxes(bmin, bmax, pad):
    if pad:
        nan = jnp.full((pad, 3), jnp.nan, jnp.float32)
        bmin = jnp.concatenate([bmin, nan], 0)
        bmax = jnp.concatenate([bmax, nan], 0)
    return jnp.concatenate(
        [bmin, bmax, jnp.zeros((bmin.shape[0], 2), jnp.float32)], axis=1)


def block_march(clusters, o, d, t_min, t_max, any_hit: bool = False):
    """Nearest-hit (or, with ``any_hit``, occlusion) query via the fused
    kernel.

    clusters: ops.sweep.ClusterSet; o, d (R, 3) with R % 128 == 0;
    t bounds (R,).  Rays must already be coherence-sorted by the caller.
    Returns (t, slot, u, v); slot indexes the sorted prim arrays (-1 miss).
    With ``any_hit`` only slot's hit/miss distinction is meaningful.
    """
    C = clusters.num_clusters
    if C > MAX_CLUSTERS:
        raise ValueError(
            f"scene has {C} clusters; the packed pick key carries "
            f"{_CID_BITS} id bits (max {MAX_CLUSTERS} clusters = "
            f"{MAX_CLUSTERS * CLUSTER_TRIS} triangles) — raise CHUNK")
    c_pad = ((C + 7) // 8) * 8
    boxes = _pad_boxes(clusters.cluster_min, clusters.cluster_max, c_pad - C)

    rays_packed_t = jnp.concatenate(
        [o.T, d.T, t_min[None, :], t_max[None, :]], axis=0)  # (8, R)
    out = _march_call(rays_packed_t, boxes, clusters.woop_t,
                      c_pad=c_pad, n_clusters=C,
                      max_visits=C + 1, any_hit=any_hit)
    out = jnp.swapaxes(out, 1, 2).reshape(-1, 4)
    t = out[:, 0]
    slotf = out[:, 1]
    miss = slotf < 0.0
    return (jnp.where(miss, INF, t),
            jnp.where(miss, -1, slotf.astype(jnp.int32)),
            out[:, 2], out[:, 3])
