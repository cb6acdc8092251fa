"""Stackless bitstack BVH traversal — the TPU throughput path.

Per-ray traversal state is a handful of registers: the current node index,
a 64-bit "bitstack" (two uint32 words) of pending far-subtree visits, and
the running best hit (Afra & Szirmay-Kalos 2014 stackless traversal).
There are NO per-lane stack arrays — the pattern that made the naive
while-while traversal fault and crawl on TPU (per-lane scatters).  Every
loop step is pure gathers + element-wise ALU across the whole wavefront:

  descend:   fetch the node's two child boxes (one packed row), slab-test
             both; leaf children are tested INLINE (contiguous Woop
             windows); push a pending bit when both internal children hit
             and continue into the nearer one;
  backtrack: pop one level per step via parent links until a pending bit
             is found, then cross to the sibling and descend it.

``vmap`` over rays gives a lockstep masked loop whose sequential length is
the per-ray traversal depth (tens of steps), with every lane doing useful
work every step — unlike packet traversal, whose sequential length is the
packet-UNION tree coverage (thousands of steps).

Fat leaves: subtrees of <= LEAF_SIZE Morton-sorted primitives collapse to
contiguous slices tested as one vectorized window.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from optix_ray_tracer_tpu.ops.bvh import build_lbvh
from optix_ray_tracer_tpu.ops.bvh_wide import _subtree_ranges, woop_transforms
from optix_ray_tracer_tpu.ops.intersect import (
    DEFAULT_T_MIN, Hit, PRIM_NONE, PRIM_TRIANGLE,
)
from optix_ray_tracer_tpu.scene.geometry import Scene
from optix_ray_tracer_tpu.utils.vecmath import INF

LEAF_SIZE = 4

_DESCEND = 0
_BACKTRACK = 1
_DONE = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlatBVH:
    """Binary fat-leaf BVH with parent/sibling links (device arrays).

    Child encoding (left/right): >= 0 internal node index; < -1 a leaf
    slice ``start = -2 - code`` of LEAF_SIZE sorted primitives.

    child_boxes: (N, 12) f32 — [lmin(3) lmax(3) rmin(3) rmax(3)] per node
    left/right/parent/sibling: (N,) int32
    woop: (n_pad, 12) sorted-triangle Woop transforms
    prim_index: (n_pad,) sorted slot -> original triangle id
    scene_lo/hi: (3,)
    """
    child_boxes: jax.Array
    left: jax.Array
    right: jax.Array
    parent: jax.Array
    sibling: jax.Array
    woop: jax.Array
    prim_index: jax.Array
    scene_lo: jax.Array
    scene_hi: jax.Array

    @property
    def num_nodes(self) -> int:
        return self.left.shape[0]


def build_flat_bvh(tri_vertices: np.ndarray) -> FlatBVH:
    """Triangles -> binary LBVH (device build) -> fat-leaf flat BVH."""
    tv = np.asarray(tri_vertices, np.float32)
    n = tv.shape[0]

    def pack_prims(order):
        n_pad = ((n + LEAF_SIZE - 1) // LEAF_SIZE) * LEAF_SIZE
        sorted_tris = tv[order]
        v0 = sorted_tris[:, 0].astype(np.float64)
        e1 = (sorted_tris[:, 1] - sorted_tris[:, 0]).astype(np.float64)
        e2 = (sorted_tris[:, 2] - sorted_tris[:, 0]).astype(np.float64)
        woop = np.zeros((n_pad, 12), np.float32)
        woop[:n] = woop_transforms(v0, e1, e2)
        prim_index = np.zeros(n_pad, np.int32)
        prim_index[:n] = order
        return woop, prim_index

    if n <= LEAF_SIZE or n < 2:
        # single pseudo-root whose two children are the same full leaf slice
        order = np.arange(n, dtype=np.int64)
        woop, prim_index = pack_prims(order)
        lo3 = tv.min(axis=(0, 1))
        hi3 = tv.max(axis=(0, 1))
        boxes = np.concatenate([lo3, hi3, lo3, hi3]).reshape(1, 12)
        return FlatBVH(
            child_boxes=jnp.asarray(boxes.astype(np.float32)),
            left=jnp.asarray([-2], jnp.int32),
            right=jnp.asarray([-2], jnp.int32),  # same slice twice; the
            # second test is redundant but harmless (bounded by best_t)
            parent=jnp.asarray([-1], jnp.int32),
            sibling=jnp.asarray([-1], jnp.int32),
            woop=jnp.asarray(woop), prim_index=jnp.asarray(prim_index),
            scene_lo=jnp.asarray(lo3), scene_hi=jnp.asarray(hi3))

    mins = jnp.asarray(tv.min(axis=1))
    maxs = jnp.asarray(tv.max(axis=1))
    cents = jnp.asarray(tv.mean(axis=1))
    bvh = build_lbvh(mins, maxs, cents)
    b_left = np.asarray(bvh.left).astype(np.int64)
    b_right = np.asarray(bvh.right).astype(np.int64)
    b_min = np.asarray(bvh.node_min)
    b_max = np.asarray(bvh.node_max)
    order = np.asarray(bvh.prim_index, np.int64)
    n_internal = n - 1

    lo, hi = _subtree_ranges(b_left, b_right, n)
    counts = hi - lo

    # internal binary nodes whose subtree is > LEAF_SIZE survive as nodes
    keep = np.zeros(2 * n - 1, bool)
    keep[:n_internal] = counts[:n_internal] > LEAF_SIZE
    if not keep[0]:
        return build_flat_bvh(tv[:LEAF_SIZE])  # degenerate; unreachable for n > LEAF_SIZE

    kept = np.where(keep)[0]
    renum = np.full(2 * n - 1, -1, np.int64)
    renum[kept] = np.arange(len(kept))

    kl = b_left[kept]
    kr = b_right[kept]
    left = np.where(keep[kl], renum[kl], -2 - lo[kl]).astype(np.int32)
    right = np.where(keep[kr], renum[kr], -2 - lo[kr]).astype(np.int32)
    child_boxes = np.concatenate(
        [b_min[kl], b_max[kl], b_min[kr], b_max[kr]], axis=1).astype(np.float32)

    N = len(kept)
    parent = np.full(N, -1, np.int32)
    sibling = np.full(N, -1, np.int32)
    l_int = left >= 0
    r_int = right >= 0
    parent[left[l_int]] = np.arange(N, dtype=np.int32)[l_int]
    parent[right[r_int]] = np.arange(N, dtype=np.int32)[r_int]
    both = l_int & r_int
    sibling[left[both]] = right[both]
    sibling[right[both]] = left[both]

    woop, prim_index = pack_prims(order)
    return FlatBVH(
        child_boxes=jnp.asarray(child_boxes),
        left=jnp.asarray(left), right=jnp.asarray(right),
        parent=jnp.asarray(parent), sibling=jnp.asarray(sibling),
        woop=jnp.asarray(woop), prim_index=jnp.asarray(prim_index),
        scene_lo=jnp.asarray(tv.min(axis=(0, 1))),
        scene_hi=jnp.asarray(tv.max(axis=(0, 1))))


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------

def _slab(o, inv_d, bmin, bmax, t_min, t_max):
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)
    enter = jnp.maximum(jnp.max(tlo, -1), t_min)
    exit_ = jnp.minimum(jnp.min(thi, -1), t_max)
    return enter <= exit_, enter


def _leaf_window_test(woop, start, o, d, t_min, best):
    """Test a LEAF_SIZE window of Woop rows against one ray (vectorized by
    vmap across rays).  best = (t, slot, u, v)."""
    rows = jax.lax.dynamic_slice(woop, (start, 0), (LEAF_SIZE, 12))
    M = rows[:, :9].reshape(LEAF_SIZE, 3, 3)
    c = rows[:, 9:12]
    op = jnp.einsum('lij,j->li', M, o,
                    precision=jax.lax.Precision.HIGHEST) - c
    dp = jnp.einsum('lij,j->li', M, d,
                    precision=jax.lax.Precision.HIGHEST)
    dz = dp[:, 2]
    t = -op[:, 2] / jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)
    uu = op[:, 0] + t * dp[:, 0]
    vv = op[:, 1] + t * dp[:, 1]
    ok = ((jnp.abs(dz) > 1e-12) & (uu >= 0.0) & (vv >= 0.0)
          & (uu + vv <= 1.0) & (t > t_min) & (t < best[0]))
    t = jnp.where(ok, t, INF)
    li = jnp.argmin(t)
    bt = t[li]
    closer = bt < best[0]
    return (jnp.where(closer, bt, best[0]),
            jnp.where(closer, start + li.astype(jnp.int32), best[1]),
            jnp.where(closer, uu[li], best[2]),
            jnp.where(closer, vv[li], best[3]))


def _traverse_one(bvh: FlatBVH, o, d, t_min, t_max):
    """Stackless traversal of one ray.  Returns (t, slot, u, v)."""
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e12)
    state = dict(
        node=jnp.int32(0), mode=jnp.int32(_DESCEND),
        bs_lo=jnp.uint32(0), bs_hi=jnp.uint32(0),
        best=(jnp.asarray(t_max, jnp.float32), jnp.int32(-1),
              jnp.float32(0.0), jnp.float32(0.0)))

    n_pad = bvh.woop.shape[0]
    max_start = n_pad - LEAF_SIZE

    def cond(s):
        return s["mode"] != _DONE

    def body(s):
        node = s["node"]
        descending = s["mode"] == _DESCEND

        # ---------------- descend half ----------------
        boxes = bvh.child_boxes[node]                      # (12,)
        li = bvh.left[node]
        ri = bvh.right[node]
        lhit, lt = _slab(o, inv_d, boxes[0:3], boxes[3:6], t_min, s["best"][0])
        rhit, rt = _slab(o, inv_d, boxes[6:9], boxes[9:12], t_min, s["best"][0])
        lhit &= descending
        rhit &= descending

        l_leaf = li < -1
        r_leaf = ri < -1
        # inline leaf tests (gathers happen regardless; validity is masked)
        lstart = jnp.clip(-2 - li, 0, max_start)
        rstart = jnp.clip(-2 - ri, 0, max_start)
        best = s["best"]
        leaf_l = _leaf_window_test(bvh.woop, lstart, o, d, t_min, best)
        use_l = lhit & l_leaf
        best = jax.tree.map(lambda a, b: jnp.where(use_l, a, b), leaf_l, best)
        leaf_r = _leaf_window_test(bvh.woop, rstart, o, d, t_min, best)
        use_r = rhit & r_leaf
        best = jax.tree.map(lambda a, b: jnp.where(use_r, a, b), leaf_r, best)

        lint = lhit & ~l_leaf
        rint = rhit & ~r_leaf
        both = lint & rint
        near_l = lt <= rt
        next_node = jnp.where(both, jnp.where(near_l, li, ri),
                              jnp.where(lint, li, ri))
        has_next = lint | rint

        # push one bit per descend level: 1 if the far child is pending
        desc_bs_hi = (s["bs_hi"] << 1) | (s["bs_lo"] >> 31)
        desc_bs_lo = (s["bs_lo"] << 1) | both.astype(jnp.uint32)

        # ---------------- backtrack half ----------------
        top = (s["bs_lo"] & 1) == 1
        bs_empty = (s["bs_lo"] | s["bs_hi"]) == 0
        parent = bvh.parent[node]
        sib = bvh.sibling[node]
        bt_node = jnp.where(top, sib, parent)
        # pop on parent-jump; clear the bit on sibling-cross
        bt_bs_lo = jnp.where(top, s["bs_lo"] ^ 1,
                             (s["bs_lo"] >> 1) | (s["bs_hi"] << 31))
        bt_bs_hi = jnp.where(top, s["bs_hi"], s["bs_hi"] >> 1)
        bt_mode = jnp.where(bs_empty, _DONE,
                            jnp.where(top, _DESCEND, _BACKTRACK))

        # ---------------- select ----------------
        node2 = jnp.where(descending,
                          jnp.where(has_next, next_node, node),
                          bt_node)
        mode2 = jnp.where(descending,
                          jnp.where(has_next, _DESCEND, _BACKTRACK),
                          bt_mode).astype(jnp.int32)
        bs_lo2 = jnp.where(descending & has_next, desc_bs_lo,
                           jnp.where(descending, s["bs_lo"], bt_bs_lo))
        bs_hi2 = jnp.where(descending & has_next, desc_bs_hi,
                           jnp.where(descending, s["bs_hi"], bt_bs_hi))
        return dict(node=node2, mode=mode2, bs_lo=bs_lo2, bs_hi=bs_hi2,
                    best=best)

    out = jax.lax.while_loop(cond, body, state)
    return out["best"]


@jax.jit
def _traverse_flat(bvh: FlatBVH, o, d, t_min, t_max):
    """o, d (R, 3); t_min/t_max (R,)."""
    f = partial(_traverse_one, bvh)
    return jax.vmap(f)(o, d, t_min, t_max)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StacklessIntersector:
    """Drop-in intersector using the bitstack flat BVH (triangles) with a
    dense sphere merge — the default high-throughput path."""
    bvh: FlatBVH

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

        t, slot, u, v = _traverse_flat(self.bvh, o2, d2, t_min_a, t_max_a)
        missed = slot < 0
        prim_id = self.bvh.prim_index[jnp.maximum(slot, 0)]
        hit = Hit(
            t=jnp.where(missed, INF, t),
            prim_type=jnp.where(missed, PRIM_NONE,
                                PRIM_TRIANGLE).astype(jnp.int32),
            prim_id=jnp.where(missed, 0, prim_id).astype(jnp.int32),
            u=jnp.where(missed, 0.0, u),
            v=jnp.where(missed, 0.0, v))
        if scene.sphere_count > 0:
            from optix_ray_tracer_tpu.ops.packet import _sphere_bruteforce_merge
            hit = _sphere_bruteforce_merge(scene, o2, d2, t_min_a, t_max_a,
                                           hit)
        return jax.tree.map(lambda x: x.reshape(shape + x.shape[1:]), hit)

    def __call__(self, scene: Scene, o, d, t_min=DEFAULT_T_MIN, t_max=INF) -> Hit:
        return self.intersect(scene, o, d, t_min, t_max)

    def any_hit(self, scene: Scene, o, d, t_min=DEFAULT_T_MIN, t_max=INF):
        return self.intersect(scene, o, d, t_min, t_max).is_hit


def make_stackless_intersector(scene: Scene) -> StacklessIntersector:
    return StacklessIntersector(
        bvh=build_flat_bvh(np.asarray(scene.triangles.vertices)))
