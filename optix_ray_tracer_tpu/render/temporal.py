"""Temporal reprojection + accumulation — the SVGF temporal term.

The reference's entire image-quality story is its AI denoiser over 1-spp
frames (``src/Global/RendererImpl.cu:584-669``).  Our spatial half is the
a-trous cascade in :mod:`render.denoise`; this module adds the temporal
half for animation: demodulated irradiance is accumulated ACROSS frames by
reprojecting each pixel to where its surface point was in the previous
frame.  Unlike screen-space engines that estimate motion, the renderer
knows every instance's rigid motion EXACTLY (Time-mode poses are
position + slerp quaternion per particle, ``models/renderer_time.py``;
Mesh mode is per-particle velocity translation), so the previous-frame
world point — and its screen position — is computed in closed form.

History validity is re-verified per tap (depth + normal tests, SVGF
disocclusion handling): wrong history is dropped, so the accumulation
never ghosts through disocclusions harder than the tolerances allow.

All functions are pure and jittable; the temporal state is a dict of
(H, W, .) arrays designed to ride a ``lax.scan`` carry through the fused
animation chunks (``models/fused.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

from optix_ray_tracer_tpu.utils.vecmath import INF, dot

# exponential blend floor: alpha_eff = max(ALPHA, 1/history_length)
DEFAULT_ALPHA = 0.2
# history length cap == 1/ALPHA keeps alpha_eff consistent at steady state
HISTORY_CAP = 32.0


def empty_state(width: int, height: int) -> dict:
    """Initial temporal state (no history)."""
    return dict(
        irr=jnp.zeros((height, width, 3), jnp.float32),
        hist=jnp.zeros((height, width, 1), jnp.float32),
        t=jnp.full((height, width), INF, jnp.float32),
        normal=jnp.zeros((height, width, 3), jnp.float32),
    )


def project_to_pixels(camera, x, width: int, height: int):
    """Continuous pixel coordinates of world points ``x`` (..., 3).

    Inverts the UVW ray model (``scene/camera.py``): u, v, w are mutually
    orthogonal (u, v unit; |w| sets the FOV), so the direction d = x - C
    decomposes as a*u + b*v + c*w and the pixel follows from
    ndc_x*aspect = a/c, ndc_y = b/c.  Returns (px, py, in_front) with
    integer coordinates at pixel centers.
    """
    d = x - camera.center
    a = dot(d, camera.u)
    b = dot(d, camera.v)
    c = dot(d, camera.w) / jnp.maximum(dot(camera.w, camera.w), 1e-12)
    in_front = c > 1e-6
    safe_c = jnp.where(in_front, c, 1.0)
    aspect = width / height
    ndc_x = a / (safe_c * aspect)
    ndc_y = b / safe_c
    px = (ndc_x + 1.0) * 0.5 * width - 0.5
    py = (1.0 - ndc_y) * 0.5 * height - 0.5
    return px, py, in_front


def _gather(img, iy, ix):
    """img (H, W, C) gathered at integer index maps iy/ix (H, W)."""
    H, W = img.shape[:2]
    flat = img.reshape(H * W, -1)
    idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    return flat[idx.reshape(-1)].reshape(idx.shape + (flat.shape[-1],))


def temporal_blend(state: dict, irr, t, normal, prev_px, prev_py,
                   prev_t_expected, in_front,
                   alpha: float = DEFAULT_ALPHA,
                   depth_tol: float = 0.05,
                   normal_min: float = 0.8):
    """Blend current demodulated irradiance with reprojected history.

    irr (H, W, 3); t (H, W) primary-hit depth (INF = miss); normal (H, W,
    3); prev_px/prev_py (H, W) continuous pixel position of this pixel's
    surface point in the PREVIOUS frame; prev_t_expected (H, W) its
    distance from the camera then; in_front (H, W) bool.

    Returns (blended (H, W, 3), new_state).  Miss pixels (sky) pass
    through untouched with history reset — the background is noise-free.
    """
    H, W = t.shape
    x0 = jnp.floor(prev_px).astype(jnp.int32)
    y0 = jnp.floor(prev_py).astype(jnp.int32)
    fx = prev_px - x0.astype(jnp.float32)
    fy = prev_py - y0.astype(jnp.float32)

    acc_irr = jnp.zeros_like(irr)
    acc_hist = jnp.zeros((H, W, 1), jnp.float32)
    wsum = jnp.zeros((H, W, 1), jnp.float32)
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            iy = y0 + dy
            ix = x0 + dx
            bw = (wy * wx)[..., None]
            inb = ((iy >= 0) & (iy < H) & (ix >= 0) & (ix < W))[..., None]
            tap_t = _gather(state["t"][..., None], iy, ix)
            tap_n = _gather(state["normal"], iy, ix)
            tap_irr = _gather(state["irr"], iy, ix)
            tap_h = _gather(state["hist"], iy, ix)
            # SVGF-style validity: same surface (relative depth), similar
            # orientation, real history
            d_ok = (jnp.abs(tap_t[..., 0] - prev_t_expected)
                    <= depth_tol * jnp.maximum(prev_t_expected, 1e-3)
                    )[..., None]
            n_ok = (jnp.sum(tap_n * normal, -1, keepdims=True) > normal_min)
            h_ok = tap_h > 0.0
            wgt = bw * inb * d_ok * n_ok * h_ok
            acc_irr = acc_irr + tap_irr * wgt
            acc_hist = acc_hist + tap_h * wgt
            wsum = wsum + wgt

    have_hist = (wsum[..., 0] > 1e-3) & in_front & (t < INF)
    inv_w = 1.0 / jnp.maximum(wsum, 1e-6)
    prev_irr = acc_irr * inv_w
    prev_hist = acc_hist * inv_w

    hist_new = jnp.where(have_hist[..., None],
                         jnp.minimum(prev_hist, HISTORY_CAP - 1.0) + 1.0,
                         1.0)
    alpha_eff = jnp.maximum(alpha, 1.0 / hist_new)
    blended = jnp.where(have_hist[..., None],
                        prev_irr + alpha_eff * (irr - prev_irr), irr)
    # sky stays exact and carries no history
    miss = (t >= INF)[..., None]
    blended = jnp.where(miss, irr, blended)
    new_state = dict(
        irr=blended,
        hist=jnp.where(miss, 0.0, hist_new),
        t=t, normal=normal)
    return blended, new_state
