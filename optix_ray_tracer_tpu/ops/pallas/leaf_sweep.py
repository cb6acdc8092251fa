"""Pallas leaf-sweep kernel: blocked dense ray x triangle-window tests.

The hot inner stage of the cluster-sweep intersector (``ops/sweep.py``):
each grid step processes one 128-ray block against one WINDOW_TRIS-triangle
window of the Morton-sorted Woop table.  The window is selected by a
SCALAR-PREFETCHED per-block window id — Mosaic turns the BlockSpec index
map into a hardware DMA of exactly the needed rows, double-buffered across
grid steps.  This is the embedding-lookup pattern: the TPU's only
bandwidth-rate mechanism for data-dependent addressing (XLA gathers measure
~100x below stream bandwidth on this chip).

Inside the kernel everything is dense: the Woop transform of all rays
against all window triangles is six (128 x 3) @ (3 x W) matmuls (MXU) plus
VPU masking and an argmin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optix_ray_tracer_tpu.utils.vecmath import INF

BLOCK_RAYS = 128
from optix_ray_tracer_tpu.ops.sweep import WINDOW_TRIS  # CHUNK * WINDOW_CHUNKS


def _kernel(win_ids_ref, rays_ref, woop_ref, out_ref):
    rays = rays_ref[...]                    # (B, 8): o(3) d(3) tmin bt
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    tmin = rays[:, 6]
    bt = rays[:, 7]
    rows = woop_ref[...]                    # (W, 12)

    hp = jax.lax.Precision.HIGHEST
    # op_i = o @ M_i^T - c_i ; dp_i = d @ M_i^T     (six MXU matmuls)
    m0 = rows[:, 0:3]
    m1 = rows[:, 3:6]
    m2 = rows[:, 6:9]
    c = rows[:, 9:12]
    opx = jnp.dot(o, m0.T, precision=hp) - c[:, 0][None, :]
    opy = jnp.dot(o, m1.T, precision=hp) - c[:, 1][None, :]
    opz = jnp.dot(o, m2.T, precision=hp) - c[:, 2][None, :]
    dpx = jnp.dot(d, m0.T, precision=hp)
    dpy = jnp.dot(d, m1.T, precision=hp)
    dpz = jnp.dot(d, m2.T, precision=hp)

    safe_dz = jnp.where(jnp.abs(dpz) > 1e-12, dpz, 1e-12)
    t = -opz / safe_dz                      # (B, W)
    uu = opx + t * dpx
    vv = opy + t * dpy
    ok = ((jnp.abs(dpz) > 1e-12) & (uu >= 0.0) & (vv >= 0.0)
          & (uu + vv <= 1.0) & (t > tmin[:, None]) & (t < bt[:, None]))
    t = jnp.where(ok, t, INF)

    li = jnp.argmin(t, axis=-1)             # (B,)
    bt2 = jnp.min(t, axis=-1)
    closer = bt2 < bt
    lif = li.astype(jnp.float32)
    # winner extraction via one-hot reduction (dense, Mosaic-friendly)
    col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    onehot = (col == li[:, None]).astype(jnp.float32)
    bu = jnp.sum(uu * onehot, axis=1)
    bv = jnp.sum(vv * onehot, axis=1)

    out_ref[...] = jnp.stack(
        [jnp.where(closer, bt2, bt),
         jnp.where(closer, lif, -1.0),
         jnp.where(closer, bu, 0.0),
         jnp.where(closer, bv, 0.0)], axis=1)


@jax.jit
def _sweep_call(win_ids, rays_packed, woop):
    nb = rays_packed.shape[0] // BLOCK_RAYS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BLOCK_RAYS, 8), lambda b, ids: (b, 0)),
            pl.BlockSpec((WINDOW_TRIS, 12), lambda b, ids: (ids[b], 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_RAYS, 4), lambda b, ids: (b, 0)),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rays_packed.shape[0], 4), jnp.float32),
        grid_spec=grid_spec,
        # interpret on CPU so the same code path is testable off-TPU
        interpret=jax.default_backend() == "cpu",
    )(win_ids, rays_packed, woop)


def window_sweep_pallas(woop, starts, o, d, t_min, best):
    """Same contract as ops.sweep._window_sweep_xla.

    starts: (NB,) tri-row starts (multiples of WINDOW_TRIS); o, d:
    (NB, B, 3); t_min: (NB, B); best: (bt, slot, u, v) each (NB, B).
    """
    nb, B = t_min.shape
    bt_in, slot_in, u_in, v_in = best
    rays_packed = jnp.concatenate(
        [o.reshape(nb * B, 3), d.reshape(nb * B, 3),
         t_min.reshape(nb * B, 1), bt_in.reshape(nb * B, 1)], axis=1)
    win_ids = (starts // WINDOW_TRIS).astype(jnp.int32)
    out = _sweep_call(win_ids, rays_packed, woop)
    bt2 = out[:, 0].reshape(nb, B)
    li = out[:, 1].reshape(nb, B)
    u2 = out[:, 2].reshape(nb, B)
    v2 = out[:, 3].reshape(nb, B)
    closer = li >= 0.0
    slot = jnp.where(closer, starts[:, None] + li.astype(jnp.int32), slot_in)
    return (jnp.where(closer, bt2, bt_in), slot,
            jnp.where(closer, u2, u_in), jnp.where(closer, v2, v_in))
