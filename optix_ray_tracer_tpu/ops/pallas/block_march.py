"""All-in-Pallas block marcher — the fused nearest-hit kernel.

One kernel performs the ENTIRE query for a 128-ray block per grid step:

1. cull: slab-test all rays against ALL cluster AABBs -> a (C, 128)
   entry matrix in VMEM scratch;
2. march: a scalar while-loop picks the nearest cluster any ray still
   needs (block-min entry, masked by per-ray best_t), DMAs its 512
   Morton-sorted Woop rows from HBM into VMEM scratch, and
3. tests densely: three (512x3)@(3x128) MXU matmuls per o/d + VPU masking,
   updating per-ray bests held in VMEM scratch.

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
CLUSTER_TRIS = 512       # must match ops.sweep.CHUNK * WINDOW_CHUNKS


def _make_kernel(C_pad: int, n_clusters: int, max_visits: int):
    def kernel(rays_ref, boxes_ref, woop_ref, out_ref, entry_ref,
               bt_ref, slot_ref, u_ref, v_ref, tri_scratch, sem):
        rays = rays_ref[...]                    # (8, B): ox oy oz dx dy dz tmin bt
        inv_d = jnp.where(jnp.abs(rays[3:6, :]) > 1e-12,
                          1.0 / rays[3:6, :], 1e12)   # (3, B)
        tmin = rays[6:7, :]                     # (1, B)
        bt0 = rays[7:8, :]                      # (1, B)

        boxes = boxes_ref[...]                  # (C_pad, 8): min(3) max(3) pad

        # ---- cull: (C, B) entry/exit ----
        ent = jnp.full((C_pad, BLOCK_RAYS), -INF, jnp.float32)
        ext = jnp.full((C_pad, BLOCK_RAYS), INF, jnp.float32)
        for ax in range(3):
            t0 = (boxes[:, ax:ax + 1] - rays[ax:ax + 1, :]) * inv_d[ax:ax + 1, :]
            t1 = (boxes[:, 3 + ax:4 + ax] - rays[ax:ax + 1, :]) * inv_d[ax:ax + 1, :]
            ent = jnp.maximum(ent, jnp.minimum(t0, t1))
            ext = jnp.minimum(ext, jnp.maximum(t0, t1))
        ent = jnp.maximum(ent, tmin)
        cid_sub = jax.lax.broadcasted_iota(jnp.int32, (C_pad, BLOCK_RAYS), 0)
        hit0 = (ent <= jnp.minimum(ext, bt0)) & (cid_sub < n_clusters)
        entry_ref[...] = jnp.where(hit0, ent, INF)   # (C, B)

        bt_ref[...] = bt0
        slot_ref[...] = jnp.full((1, BLOCK_RAYS), -1.0, jnp.float32)
        u_ref[...] = jnp.zeros((1, BLOCK_RAYS), jnp.float32)
        v_ref[...] = jnp.zeros((1, BLOCK_RAYS), jnp.float32)

        hp = jax.lax.Precision.HIGHEST
        o_rows = rays[0:3, :]                   # (3, B)
        d_rows = rays[3:6, :]

        cid_col = jax.lax.broadcasted_iota(jnp.int32, (C_pad, 1), 0)

        def pick(visited):
            """Nearest cluster any ray still needs; (c, any) scalars."""
            bt = bt_ref[...]
            entry = entry_ref[...]
            live = entry < bt
            needed = jnp.any(live, axis=1, keepdims=True) & (visited < 0.5)
            block_entry = jnp.min(jnp.where(live, entry, INF), axis=1,
                                  keepdims=True)
            key = jnp.where(needed, block_entry, INF)
            kmin = jnp.min(key)
            c = jnp.min(jnp.where(key <= kmin, cid_col, C_pad))
            return c, kmin < INF

        def start_dma(c, slot):
            return pltpu.make_async_copy(
                woop_ref.at[pl.ds(c * CLUSTER_TRIS, CLUSTER_TRIS), :],
                tri_scratch.at[slot], sem.at[slot])

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
                rows = tri_scratch[slot]         # (W, 128)
                m0 = rows[:, 0:3]
                m1 = rows[:, 3:6]
                m2 = rows[:, 6:9]
                # (W, 3) @ (3, B) -> (W, B); triangles sublanes, rays lanes
                opx = jnp.dot(m0, o_rows, precision=hp) - rows[:, 9:10]
                opy = jnp.dot(m1, o_rows, precision=hp) - rows[:, 10:11]
                opz = jnp.dot(m2, o_rows, precision=hp) - rows[:, 11:12]
                dpx = jnp.dot(m0, d_rows, precision=hp)
                dpy = jnp.dot(m1, d_rows, precision=hp)
                dpz = jnp.dot(m2, d_rows, precision=hp)
                safe = jnp.where(jnp.abs(dpz) > 1e-12, dpz, 1e-12)
                t = -opz / safe
                uu = opx + t * dpx
                vv = opy + t * dpy
                bt_cur = bt_ref[...]
                ok = ((jnp.abs(dpz) > 1e-12) & (uu >= 0.0) & (vv >= 0.0)
                      & (uu + vv <= 1.0) & (t > tmin) & (t < bt_cur))
                t = jnp.where(ok, t, INF)
                t_best = jnp.min(t, axis=0, keepdims=True)       # (1, B)
                closer = t_best < bt_cur
                tri_sub = jax.lax.broadcasted_iota(
                    jnp.int32, (CLUSTER_TRIS, BLOCK_RAYS), 0)
                li = jnp.min(jnp.where(t <= t_best, tri_sub, CLUSTER_TRIS),
                             axis=0, keepdims=True)              # (1, B)
                winner = tri_sub == li
                bu = jnp.max(jnp.where(winner, uu, -INF), axis=0,
                             keepdims=True)
                bv = jnp.max(jnp.where(winner, vv, -INF), axis=0,
                             keepdims=True)
                slotf = (cur_c * CLUSTER_TRIS + li).astype(jnp.float32)
                bt_ref[...] = jnp.where(closer, t_best, bt_cur)
                slot_ref[...] = jnp.where(closer, slotf, slot_ref[...])
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


@partial(jax.jit, static_argnames=("c_pad", "n_clusters", "max_visits"))
def _march_call(rays_packed_t, boxes, woop, c_pad: int, n_clusters: int,
                max_visits: int):
    """rays_packed_t: (8, R) transposed ray state; boxes: (c_pad, 8)."""
    nb = rays_packed_t.shape[1] // BLOCK_RAYS
    kernel = _make_kernel(c_pad, n_clusters, max_visits)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, 4, BLOCK_RAYS), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, BLOCK_RAYS), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),       # cluster boxes
            pl.BlockSpec(memory_space=pltpu.ANY),        # woop stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 4, BLOCK_RAYS), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c_pad, BLOCK_RAYS), jnp.float32),   # entry matrix
            pltpu.VMEM((1, BLOCK_RAYS), jnp.float32),       # best t
            pltpu.VMEM((1, BLOCK_RAYS), jnp.float32),       # best slot (f32)
            pltpu.VMEM((1, BLOCK_RAYS), jnp.float32),       # best u
            pltpu.VMEM((1, BLOCK_RAYS), jnp.float32),       # best v
            pltpu.VMEM((2, CLUSTER_TRIS, 128), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() == "cpu",
    )(rays_packed_t, boxes, woop)


def block_march(clusters, o, d, t_min, t_max):
    """Nearest-hit query via the fused kernel.

    clusters: ops.sweep.ClusterSet; o, d (R, 3) with R % 128 == 0;
    t bounds (R,).  Rays must already be coherence-sorted by the caller.
    Returns (t, slot, u, v); slot indexes the sorted prim arrays (-1 miss).
    """
    C = clusters.num_clusters
    # pad the cluster axis to the fp32 sublane tile
    c_pad = ((C + 7) // 8) * 8
    cmin = clusters.cluster_min
    cmax = clusters.cluster_max
    pad = c_pad - C
    if pad:
        nan = jnp.full((pad, 3), jnp.nan, jnp.float32)
        cmin = jnp.concatenate([cmin, nan], 0)
        cmax = jnp.concatenate([cmax, nan], 0)
    boxes = jnp.concatenate([cmin, cmax, jnp.zeros((c_pad, 2), jnp.float32)],
                            axis=1)             # (c_pad, 8)

    rays_packed_t = jnp.concatenate(
        [o.T, d.T, t_min[None, :], t_max[None, :]], axis=0)  # (8, R)
    # manual DMAs require 128-lane-aligned source rows: pad the 12-float
    # woop rows to 128 (the extra lanes are dead weight on the wire but the
    # per-cluster DMA is latency-bound regardless)
    woop128 = jnp.pad(clusters.woop, ((0, 0), (0, 128 - 12)))
    out = _march_call(rays_packed_t, boxes, woop128,
                      c_pad=c_pad, n_clusters=C, max_visits=C + 1)
    out = jnp.swapaxes(out, 1, 2).reshape(-1, 4)
    t = out[:, 0]
    slotf = out[:, 1]
    miss = slotf < 0.0
    return (jnp.where(miss, INF, t),
            jnp.where(miss, -1, slotf.astype(jnp.int32)),
            out[:, 2], out[:, 3])
