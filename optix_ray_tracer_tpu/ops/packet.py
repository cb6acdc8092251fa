"""Packet traversal of the wide BVH — pure-JAX, TPU-shaped.

Design: rays are grouped into PACKETS of B rays that traverse together with
ONE shared stack.  Every step pops one entry and either

* tests the W child boxes of an internal node against all B rays at once —
  a (B, W) vectorized slab test — pushing children any ray entered, or
* tests a leaf window of L Woop-transformed triangles against all B rays —
  a (B, L) batched affine test.

All memory access is packet-uniform: the node fetch is a scalar
dynamic-slice (one row), broadcast to the whole packet.  No per-lane
gathers, no per-lane stacks — the two patterns TPUs punish.  ``vmap`` over
packets turns the per-packet while-loop into a lockstep masked loop at
PACKET granularity (packets of coherent rays retire together).

Leaf windows exploit a property of the collapsed LBVH: leaves are
contiguous slices of the Morton-sorted primitive array, so testing a fixed
L-window may touch a neighbor leaf's primitives — which are real scene
primitives, so any hit found is still correct; the only cost is redundant
work, never wrong results.

Incoherent bounce rays should be sorted before traversal (see
``sort_rays_by_direction``): packets of similar rays visit fewer nodes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from optix_ray_tracer_tpu.ops.bvh_wide import (
    CHILD_EMPTY, LEAF_SIZE, WIDTH, WideBVH,
)
from optix_ray_tracer_tpu.ops.intersect import (
    DEFAULT_T_MIN, Hit, PRIM_NONE, PRIM_SPHERE, PRIM_TRIANGLE,
)
from optix_ray_tracer_tpu.scene.geometry import Scene
from optix_ray_tracer_tpu.utils.vecmath import INF

PACKET_SIZE = 256
# Deep enough for a degenerate level-cut 8-wide LBVH: depth is bounded by
# the binary depth (~64 with the morton+index keys) / 3 levels per wide
# node, times up to 7 pushed siblings.
STACK_DEPTH = 256


def _packet_traverse(wbvh: WideBVH, o, d, t_min, t_max):
    """Traverse one packet: o, d (B, 3); t_min/t_max (B,) per-ray bounds.
    Returns (t, slot, u, v) with slot = index into the sorted prim arrays
    (-1 = miss)."""
    B = o.shape[0]
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e12)
    n_pad = wbvh.woop.shape[0]
    max_start = n_pad - LEAF_SIZE

    stack = jnp.zeros((STACK_DEPTH,), jnp.int32)  # root node = 0 preloaded
    state = dict(
        stack=stack, sp=jnp.int32(1),
        best_t=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (B,)),
        slot=jnp.full((B,), -1, jnp.int32),
        u=jnp.zeros((B,), jnp.float32),
        v=jnp.zeros((B,), jnp.float32))

    def cond(s):
        return s["sp"] > 0

    def body(s):
        entry = s["stack"][s["sp"] - 1]
        sp = s["sp"] - 1
        is_leaf = entry < -1

        # ---------------- internal node: (B, W) box test ----------------
        node = jnp.maximum(entry, 0)
        bmin = wbvh.box_min[node]          # (W, 3)
        bmax = wbvh.box_max[node]
        children = wbvh.child[node]        # (W,)

        t0 = (bmin[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
        t1 = (bmax[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
        tlo = jnp.minimum(t0, t1)
        thi = jnp.maximum(t0, t1)
        t_enter = jnp.maximum(jnp.max(tlo, -1), t_min[:, None])  # (B, W)
        t_exit = jnp.minimum(jnp.min(thi, -1), s["best_t"][:, None])
        hit_w = t_enter <= t_exit                            # (B, W)
        alive_w = jnp.any(hit_w, axis=0) & (children != CHILD_EMPTY) \
            & jnp.logical_not(is_leaf)                       # (W,)

        # Push ALL hit children with ONE dynamic_update_slice: sort the
        # 8 slots far-to-near with dead slots at the end, write the whole
        # window at sp, advance sp by the live count.  (One 8-element sort
        # + one DUS per step instead of 8 dependent scatters.)
        near_t = jnp.min(jnp.where(hit_w, t_enter, INF), axis=0)  # (W,)
        # ascending sort of -near_t => far children first, nearest on top
        # of the stack (popped first); dead slots (+INF) land past the end
        order = jnp.argsort(jnp.where(alive_w, -near_t, INF))
        window = children[order]
        n_push = jnp.sum(alive_w).astype(jnp.int32)
        sp_safe = jnp.minimum(sp, STACK_DEPTH - WIDTH)
        stack2 = jax.lax.dynamic_update_slice(s["stack"], window, (sp_safe,))
        sp2 = sp_safe + n_push

        # ---------------- leaf: (B, L) woop test -------------------------
        start = jnp.clip(-2 - entry, 0, max_start)
        rows = jax.lax.dynamic_slice(wbvh.woop, (start, 0), (LEAF_SIZE, 12))
        M = rows[:, :9].reshape(LEAF_SIZE, 3, 3)
        c = rows[:, 9:12]
        # o' = M@o - c ; d' = M@d     -> shapes (B, L, 3)
        # (HIGHEST precision: TPU einsum defaults would use bf16 multiplies)
        op = jnp.einsum('lij,bj->bli', M, o,
                        precision=jax.lax.Precision.HIGHEST) - c[None, :, :]
        dp = jnp.einsum('lij,bj->bli', M, d,
                        precision=jax.lax.Precision.HIGHEST)
        dz = dp[..., 2]
        safe_dz = jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)
        t = -op[..., 2] / safe_dz                            # (B, L)
        uu = op[..., 0] + t * dp[..., 0]
        vv = op[..., 1] + t * dp[..., 1]
        ok = ((jnp.abs(dz) > 1e-12) & (uu >= 0.0) & (vv >= 0.0)
              & (uu + vv <= 1.0) & (t > t_min[:, None])
              & (t < s["best_t"][:, None]) & is_leaf)
        t = jnp.where(ok, t, INF)
        li = jnp.argmin(t, axis=-1)                          # (B,)
        bt = jnp.take_along_axis(t, li[:, None], -1)[:, 0]
        closer = bt < s["best_t"]
        best_t = jnp.where(closer, bt, s["best_t"])
        slot = jnp.where(closer, start + li.astype(jnp.int32), s["slot"])
        bu = jnp.take_along_axis(uu, li[:, None], -1)[:, 0]
        bv = jnp.take_along_axis(vv, li[:, None], -1)[:, 0]
        u = jnp.where(closer, bu, s["u"])
        v = jnp.where(closer, bv, s["v"])

        return dict(stack=stack2, sp=sp2, best_t=best_t, slot=slot, u=u, v=v)

    out = jax.lax.while_loop(cond, body, state)
    return out["best_t"], out["slot"], out["u"], out["v"]


@partial(jax.jit, static_argnames=())
def _traverse_packets(wbvh: WideBVH, o, d, t_min, t_max):
    """o, d: (P, B, 3) packets; t_min/t_max: (P, B)."""
    return jax.vmap(partial(_packet_traverse, wbvh))(o, d, t_min, t_max)


def _sphere_bruteforce_merge(scene: Scene, o, d, t_min, t_max, hit: Hit) -> Hit:
    """Fold the (few) spheres in via a dense test; scenes are triangle-heavy
    and spheres are config extras (ground plane etc.)."""
    from optix_ray_tracer_tpu.ops.intersect import ray_sphere_block
    ts = ray_sphere_block(o, d, scene.spheres.centers, scene.spheres.radii,
                          t_min, t_max)                     # (R, S)
    si = jnp.argmin(ts, axis=-1)
    st = jnp.take_along_axis(ts, si[:, None], -1)[:, 0]
    closer = st < hit.t
    return Hit(
        t=jnp.where(closer, st, hit.t),
        prim_type=jnp.where(closer, PRIM_SPHERE, hit.prim_type),
        prim_id=jnp.where(closer, si.astype(jnp.int32), hit.prim_id),
        u=jnp.where(closer, 0.0, hit.u),
        v=jnp.where(closer, 0.0, hit.v))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PacketIntersector:
    """Wide-BVH packet intersector (drop-in for the wavefront integrator).

    Build with :func:`make_packet_intersector`.  Triangles traverse the wide
    BVH; spheres merge via a dense test.
    """
    wbvh: WideBVH

    def intersect(self, scene: Scene, o, d, t_min=DEFAULT_T_MIN,
                  t_max=INF) -> Hit:
        shape = o.shape[:-1]
        o2 = o.reshape(-1, 3)
        d2 = d.reshape(-1, 3)
        n = o2.shape[0]
        # scalar or per-ray bounds
        t_min_a = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32).reshape(-1)
                                   if jnp.ndim(t_min) else
                                   jnp.asarray(t_min, jnp.float32), (n,))
        t_max_a = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32).reshape(-1)
                                   if jnp.ndim(t_max) else
                                   jnp.asarray(t_max, jnp.float32), (n,))
        o_orig, d_orig = o2, d2
        t_min_orig, t_max_orig = t_min_a, t_max_a
        # sort the wavefront by coherence key so packets are spatial tiles
        # (scan-order pixel rows would make every packet span the image)
        key = ray_sort_keys(o2, d2, self.wbvh.scene_lo, self.wbvh.scene_hi)
        perm = jnp.argsort(key)
        o2 = o2[perm]
        d2 = d2[perm]
        t_min_a = t_min_a[perm]
        t_max_a = t_max_a[perm]

        pad = (-n) % PACKET_SIZE
        if pad:
            o2 = jnp.pad(o2, ((0, pad), (0, 0)))
            d2 = jnp.pad(d2, ((0, pad), (0, 0)), constant_values=0.0)
            d2 = d2.at[n:, 2].set(1.0)
            t_min_a = jnp.pad(t_min_a, (0, pad), constant_values=1.0)
            t_max_a = jnp.pad(t_max_a, (0, pad), constant_values=0.0)
        P = o2.shape[0] // PACKET_SIZE
        t, slot, u, v = _traverse_packets(
            self.wbvh,
            o2.reshape(P, PACKET_SIZE, 3), d2.reshape(P, PACKET_SIZE, 3),
            t_min_a.reshape(P, PACKET_SIZE), t_max_a.reshape(P, PACKET_SIZE))
        # unsort: results are in sorted order; scatter back to ray order
        inv_perm = jnp.argsort(perm)
        t = t.reshape(-1)[:n][inv_perm]
        slot = slot.reshape(-1)[:n][inv_perm]
        u = u.reshape(-1)[:n][inv_perm]
        v = v.reshape(-1)[:n][inv_perm]

        missed = slot < 0
        prim_id = self.wbvh.prim_index[jnp.maximum(slot, 0)]
        hit = Hit(
            t=jnp.where(missed, INF, t),
            prim_type=jnp.where(missed, PRIM_NONE, PRIM_TRIANGLE).astype(jnp.int32),
            prim_id=jnp.where(missed, 0, prim_id).astype(jnp.int32),
            u=jnp.where(missed, 0.0, u),
            v=jnp.where(missed, 0.0, v))
        if scene.sphere_count > 0:
            hit = _sphere_bruteforce_merge(scene, o_orig, d_orig,
                                           t_min_orig, t_max_orig, hit)
        return jax.tree.map(lambda x: x.reshape(shape + x.shape[1:]), hit)

    def __call__(self, scene: Scene, o, d, t_min=DEFAULT_T_MIN, t_max=INF) -> Hit:
        return self.intersect(scene, o, d, t_min, t_max)

    def any_hit(self, scene: Scene, o, d, t_min=DEFAULT_T_MIN, t_max=INF):
        return self.intersect(scene, o, d, t_min, t_max).is_hit


def make_packet_intersector(scene: Scene) -> PacketIntersector:
    """Build the wide BVH for a scene's triangles (host-side collapse)."""
    import numpy as np

    from optix_ray_tracer_tpu.ops.bvh_wide import build_wide_bvh
    tv = np.asarray(scene.triangles.vertices)
    return PacketIntersector(wbvh=build_wide_bvh(tv))


def ray_sort_keys(o, d, scene_lo, scene_hi):
    """Coherence keys: coarse origin Morton (high bits) + direction Morton
    (low bits).

    Packets are only efficient when their rays visit similar subtrees; this
    key makes that true for BOTH camera rays (identical origin => key is a
    direction-space tile index) and bounce rays (origin locality dominates).
    The full-wavefront sort is one 32-bit XLA sort — cheap next to traversal.
    """
    from optix_ray_tracer_tpu.ops.bvh import morton_codes
    o_morton = morton_codes(o, scene_lo, scene_hi)       # 30 bits
    d_morton = morton_codes(d, jnp.full(3, -1.0), jnp.full(3, 1.0))
    key = ((o_morton >> 18) << 20) | (d_morton >> 10)
    return key


def sort_rays_by_direction(o, d, bits: int = 6):
    """(perm, inv_perm) ordering rays by the coherence key above."""
    key = ray_sort_keys(o, d, jnp.min(o, axis=0), jnp.max(o, axis=0))
    perm = jnp.argsort(key)
    inv_perm = jnp.argsort(perm)
    return perm, inv_perm
