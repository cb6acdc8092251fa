"""Wide (8-ary) BVH with collapsed leaves — the TPU throughput format.

The binary LBVH (``ops/bvh.py``) is the *builder* format; for traversal
throughput on a vector machine we collapse it into a W-wide BVH with leaves
of up to L primitives:

* Depth drops from ~2*log2(n) to ~log_W(n): fewer traversal steps, and each
  step tests W child boxes AT ONCE across a whole ray packet — a (B, W)
  vectorized slab test instead of per-ray pointer chasing.
* A Karras internal node covers a CONTIGUOUS range of Morton-sorted leaves,
  so collapsed leaves are (start, count) slices of the sorted primitive
  arrays — leaf tests are dynamic-slice windows, not gathers.
* Triangles are pre-transformed into Woop unit-triangle space (Woop 2004):
  9+3 floats per triangle; the per-pair intersection needs no cross
  products, so a leaf test is a dense batched affine transform — MXU/VPU
  friendly.

The collapse itself runs on host (NumPy, build-once scenes); dynamic scenes
use the binary device path or rebuild per frame (collapse is O(n)).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from optix_ray_tracer_tpu.ops.bvh import LBVH

WIDTH = 8          # children per wide node
LEAF_SIZE = 8      # max primitives per leaf

CHILD_EMPTY = -1   # child slot unused
# child >= 0: internal wide-node index; child encoded < -1: leaf — see below
# leaf child c encodes the sorted-prim slice [start, start+count):
#   c = -2 - start  (count stored separately)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WideBVH:
    """Packed wide BVH over triangles (device arrays).

    child:        (Nn, W) int32 — >=0 internal; CHILD_EMPTY unused; else leaf
    child_count:  (Nn, W) int32 — prim count for leaf children (0 otherwise)
    box_min:      (Nn, W, 3) f32
    box_max:      (Nn, W, 3) f32
    woop:         (n_pad, 12) f32 — sorted-prim Woop transforms
                  rows: [M00..M22 (9), c0 c1 c2 (3)]; p' = M @ p - c
    prim_index:   (n_pad,) int32 — sorted slot -> original triangle id
    scene_lo/hi:  (3,) f32 — scene bounds (for ray-coherence sort keys)
    """
    child: jax.Array
    child_count: jax.Array
    box_min: jax.Array
    box_max: jax.Array
    woop: jax.Array
    prim_index: jax.Array
    scene_lo: jax.Array
    scene_hi: jax.Array

    @property
    def num_nodes(self) -> int:
        return self.child.shape[0]


def woop_transforms(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> np.ndarray:
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
    out = np.concatenate([M.reshape(n, 9), c], axis=1).astype(np.float32)
    return out


def _subtree_ranges(left: np.ndarray, right: np.ndarray, n: int):
    """For each internal node, the [lo, hi) range of sorted leaves it covers
    (Karras nodes cover contiguous sorted ranges)."""
    n_internal = n - 1
    lo = np.full(2 * n - 1, -1, np.int64)
    hi = np.full(2 * n - 1, -1, np.int64)
    lo[n_internal:] = np.arange(n)
    hi[n_internal:] = np.arange(n) + 1
    # children have higher creation order? Not guaranteed — iterate to fixed
    # point bottom-up (<= depth passes).
    for _ in range(64):
        l_lo = lo[left]
        r_hi = hi[right]
        ready = (l_lo >= 0) & (r_hi >= 0) & (lo[:n_internal] < 0)
        if not ready.any():
            if (lo[:n_internal] >= 0).all():
                break
            continue
        idx = np.where(ready)[0]
        lo[idx] = l_lo[idx]
        hi[idx] = r_hi[idx]
        if (lo[:n_internal] >= 0).all():
            break
    return lo, hi


def collapse(bvh: LBVH, tri_vertices: np.ndarray) -> WideBVH:
    """Binary LBVH -> WideBVH (host-side, fully vectorized NumPy).

    Widening rule: every wide node corresponds to a binary node and its
    children are the binary descendants exactly log2(WIDTH) levels down,
    stopping early at subtrees with <= LEAF_SIZE primitives (those become
    leaf children).  This is a "level cut" collapse: O(n) array ops per BFS
    level, no Python-per-node loops.

    tri_vertices: (n, 3, 3) original-order triangle vertices (the same soup
    the LBVH indexed — triangles only; mixed scenes route spheres through
    the brute-force merge path in ``ops/packet.py``)."""
    n = bvh.num_prims
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    node_min = np.asarray(bvh.node_min)
    node_max = np.asarray(bvh.node_max)
    order = np.asarray(bvh.prim_index)
    n_internal = n - 1

    lo, hi = _subtree_ranges(left, right, n)
    counts = hi - lo
    levels = int(np.log2(WIDTH))

    # BFS frontier of binary nodes, each becoming one wide node.
    frontier = np.asarray([0] if n_internal > 0 else [], np.int64)
    child_rows: list[np.ndarray] = []       # (F, WIDTH) encoded children
    count_rows: list[np.ndarray] = []
    bmin_rows: list[np.ndarray] = []
    bmax_rows: list[np.ndarray] = []
    frontier_order: list[np.ndarray] = []   # binary node id per wide node
    wide_of_binary = np.full(max(2 * n - 1, 1), -1, np.int64)
    next_wide = 0

    while frontier.size:
        F = frontier.size
        wide_of_binary[frontier] = next_wide + np.arange(F)
        next_wide += F
        frontier_order.append(frontier)

        # expand each frontier node `levels` times: entries (F, k)
        entries = frontier[:, None]                         # (F, 1)
        stopped = counts[entries] <= LEAF_SIZE              # binary leaves
        for _ in range(levels):
            k = entries.shape[1]
            l = left[np.clip(entries, 0, max(n_internal - 1, 0))]
            r = right[np.clip(entries, 0, max(n_internal - 1, 0))]
            keep = stopped
            new_entries = np.empty((F, 2 * k), np.int64)
            new_stopped = np.empty((F, 2 * k), bool)
            new_entries[:, 0::2] = np.where(keep, entries, l)
            new_entries[:, 1::2] = np.where(keep, -1, r)    # -1 = hole
            new_stopped[:, 0::2] = keep | (counts[np.abs(new_entries[:, 0::2])] <= LEAF_SIZE)
            new_stopped[:, 1::2] = (new_entries[:, 1::2] < 0) | \
                (counts[np.clip(new_entries[:, 1::2], 0, 2 * n - 2)] <= LEAF_SIZE)
            entries, stopped = new_entries, new_stopped

        holes = entries < 0
        e = np.clip(entries, 0, 2 * n - 2)
        is_leaf_child = (counts[e] <= LEAF_SIZE) & ~holes
        is_inner_child = ~is_leaf_child & ~holes

        row_child = np.full((F, WIDTH), CHILD_EMPTY, np.int64)
        row_child[is_leaf_child] = -2 - lo[e[is_leaf_child]]
        # inner children resolved after their wide ids are assigned
        row_child[is_inner_child] = -(10 ** 9) - e[is_inner_child]  # marker
        row_count = np.where(is_leaf_child, counts[e], 0)
        row_bmin = np.where(holes[..., None], 0.0, node_min[e])
        row_bmax = np.where(holes[..., None], 0.0, node_max[e])

        child_rows.append(row_child)
        count_rows.append(row_count)
        bmin_rows.append(row_bmin.astype(np.float32))
        bmax_rows.append(row_bmax.astype(np.float32))

        frontier = e[is_inner_child].ravel()

    if not child_rows:
        # n == 1: single wide node, single leaf child
        child = np.full((1, WIDTH), CHILD_EMPTY, np.int32)
        child[0, 0] = -2 - 0
        child_count = np.zeros((1, WIDTH), np.int32)
        child_count[0, 0] = 1
        box_min = np.zeros((1, WIDTH, 3), np.float32)
        box_max = np.zeros((1, WIDTH, 3), np.float32)
        box_min[0, 0] = node_min[0]
        box_max[0, 0] = node_max[0]
    else:
        child = np.concatenate(child_rows, 0)
        child_count = np.concatenate(count_rows, 0).astype(np.int32)
        box_min = np.concatenate(bmin_rows, 0)
        box_max = np.concatenate(bmax_rows, 0)
        # resolve inner markers -> wide indices
        marker = child <= -(10 ** 9)
        binary_ids = (-(10 ** 9) - child[marker]).astype(np.int64)
        child[marker] = wide_of_binary[binary_ids]
        child = child.astype(np.int32)

    # --- sorted prim data + woop -------------------------------------------
    n_pad = ((n + LEAF_SIZE - 1) // LEAF_SIZE) * LEAF_SIZE
    sorted_tris = tri_vertices[order]                      # (n, 3, 3)
    v0 = sorted_tris[:, 0].astype(np.float64)
    e1 = (sorted_tris[:, 1] - sorted_tris[:, 0]).astype(np.float64)
    e2 = (sorted_tris[:, 2] - sorted_tris[:, 0]).astype(np.float64)
    woop = np.zeros((n_pad, 12), np.float32)
    woop[:n] = woop_transforms(v0, e1, e2)
    prim_index = np.zeros(n_pad, np.int32)
    prim_index[:n] = order

    prim_lo = tri_vertices.min(axis=(0, 1)).astype(np.float32)
    prim_hi = tri_vertices.max(axis=(0, 1)).astype(np.float32)
    return WideBVH(child=jnp.asarray(child),
                   child_count=jnp.asarray(child_count),
                   box_min=jnp.asarray(box_min),
                   box_max=jnp.asarray(box_max),
                   woop=jnp.asarray(woop),
                   prim_index=jnp.asarray(prim_index),
                   scene_lo=jnp.asarray(prim_lo),
                   scene_hi=jnp.asarray(prim_hi))


def build_wide_bvh(tri_vertices) -> WideBVH:
    """Convenience: triangles -> binary LBVH (device) -> wide BVH (host)."""
    from optix_ray_tracer_tpu.ops.bvh import build_lbvh

    tv = np.asarray(tri_vertices, np.float32)
    mins = jnp.asarray(tv.min(axis=1))
    maxs = jnp.asarray(tv.max(axis=1))
    cents = jnp.asarray(tv.mean(axis=1))
    if tv.shape[0] == 1:
        # degenerate: single-leaf wide BVH
        bvh = LBVH(node_min=jnp.asarray(tv.min(axis=1)),
                   node_max=jnp.asarray(tv.max(axis=1)),
                   left=jnp.zeros((0,), jnp.int32),
                   right=jnp.zeros((0,), jnp.int32),
                   prim_index=jnp.zeros((1,), jnp.int32))
        return collapse(bvh, tv)
    bvh = build_lbvh(mins, maxs, cents)
    return collapse(bvh, tv)
