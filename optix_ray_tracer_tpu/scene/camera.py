"""UVW camera model + headless fly-camera controller.

Reproduces the reference's camera exactly:

* UVW construction (``src/GraphicsAPI/SDL_GraphicsWindow.cu:4-14``):
  ``W = target - center`` (NOT normalized — |W| sets the field of view),
  ``U = normalize(cross(W, up))``, ``V = normalize(cross(U, W))``.
* Ray generation (``shader/Shader.cu:249-261``): pixel-centered NDC in
  [-1, 1], aspect applied to x, ``dir = normalize(ndc.x*aspect*U +
  ndc.y*V + W)``.
* Fly-camera update (``SDL_GraphicsWindow.cu:79-214``): yaw about V, pitch
  about U, asin-based pitch clamp against the up axis, WASD movement with
  the forward direction projected onto the horizontal plane.

Convention: we keep the OpenGL-style orientation (no up-flip — the flip in
the reference only compensates swapchain coordinate systems of VK/D3D,
``SDL_GraphicsWindow.cu:8-9``), and image row 0 is the TOP of the picture
(PNG order), so ``ndc_y = 1 - 2*(iy+0.5)/h``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from optix_ray_tracer_tpu.utils.vecmath import (
    EPS, cross, dot, length, normalize, rotate_about_axis, degrees_to_radians,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Immutable thin-lens camera (a pytree-of-arrays; jit-friendly).

    ``aperture`` (lens radius in world units; 0 = pinhole, the reference
    model) and ``focus_dist`` (distance to the plane of sharp focus
    along unit-w; <= 0 = auto, the target distance |w|) are extensions —
    the reference has no depth of field."""
    center: Any   # (3,) float32
    u: Any        # (3,) unit right
    v: Any        # (3,) unit up
    w: Any        # (3,) UN-normalized forward = target - center
    up: Any       # (3,) unit world-up (kept for the controller)
    target: Any   # (3,)
    # static (trace-time) lens parameters: pinhole cameras compile with
    # ZERO DOF overhead — the lens path is pruned at trace, not selected
    # at runtime.  A new aperture value triggers one re-jit.
    aperture: float = dataclasses.field(
        default=0.0, metadata=dict(static=True))
    focus_dist: float = dataclasses.field(
        default=-1.0, metadata=dict(static=True))

    @staticmethod
    def look_at(center, target, up, aperture: float = 0.0,
                focus_dist: float = -1.0) -> "Camera":
        """UVW construction, semantics of SDL_GraphicsWindowConfigureCamera."""
        center = jnp.asarray(center, jnp.float32)
        target = jnp.asarray(target, jnp.float32)
        up = normalize(jnp.asarray(up, jnp.float32))
        w = target - center
        u = normalize(cross(w, up))
        v = normalize(cross(u, w))
        return Camera(center=center, u=u, v=v, w=w, up=up, target=target,
                      aperture=float(aperture),
                      focus_dist=float(focus_dist))

    def generate_rays(self, width: int, height: int, jitter=None,
                      lens_uv=None):
        """Primary rays for every pixel.

        ``jitter``: optional (H, W, 2) subpixel offsets in [0,1) for
        antialiasing (the reference renders 1 spp at pixel centers and
        denoises; we support both).  ``lens_uv``: optional (..., 2) unit-
        disk samples for thin-lens depth of field — scaled by
        ``aperture``, so a pinhole camera (aperture 0) returns the
        BIT-EXACT pinhole rays via a select.  Returns (origins,
        directions) of shape (H, W, 3); row 0 is the image top.
        """
        iy = jnp.arange(height, dtype=jnp.float32)[:, None]
        ix = jnp.arange(width, dtype=jnp.float32)[None, :]
        if jitter is None:
            ox = oy = 0.5
        else:
            ox = jitter[..., 0]
            oy = jitter[..., 1]
        ndc_x = ((ix + ox) / width) * 2.0 - 1.0
        ndc_y = 1.0 - ((iy + oy) / height) * 2.0
        aspect = width / height
        d = (ndc_x[..., None] * aspect * self.u
             + ndc_y[..., None] * self.v
             + self.w)
        directions = normalize(d)
        origins = jnp.broadcast_to(self.center, directions.shape)
        if lens_uv is not None:
            origins, directions = self.apply_lens(origins, directions,
                                                  lens_uv)
        return origins, directions

    def generate_rays_for_pixels(self, pixel_id, width: int, height: int,
                                 jitter=None, lens_uv=None):
        """Primary rays for an arbitrary SUBSET of pixels, by flat pixel id
        (``iy * width + ix``, row 0 = image top) — the adaptive sampler's
        ray generator (render/adaptive.py).  Same math as
        :meth:`generate_rays` restricted to the given lanes: for the full
        ``arange(width*height)`` id vector the outputs are bit-identical
        to the grid path (tests/test_adaptive.py).

        ``jitter``: optional (R, 2) subpixel offsets; ``lens_uv``:
        optional (R, 2) unit-disk samples (thin lens, static aperture).
        Returns (origins, directions) of shape (R, 3)."""
        pid = jnp.asarray(pixel_id, jnp.int32)
        ix = (pid % width).astype(jnp.float32)
        iy = (pid // width).astype(jnp.float32)
        if jitter is None:
            ox = oy = 0.5
        else:
            ox = jitter[..., 0]
            oy = jitter[..., 1]
        ndc_x = ((ix + ox) / width) * 2.0 - 1.0
        ndc_y = 1.0 - ((iy + oy) / height) * 2.0
        aspect = width / height
        d = (ndc_x[..., None] * aspect * self.u
             + ndc_y[..., None] * self.v
             + self.w)
        directions = normalize(d)
        origins = jnp.broadcast_to(self.center, directions.shape)
        if lens_uv is not None:
            origins, directions = self.apply_lens(origins, directions,
                                                  lens_uv)
        return origins, directions

    def apply_lens(self, origins, directions, lens_uv):
        """Thin-lens transform: jitter origins on the aperture disk and
        re-aim at the focus plane (perpendicular to w at ``focus_dist``).
        Aperture is static: a pinhole camera returns the inputs untouched
        (bit-identical, zero compiled overhead)."""
        if float(self.aperture) <= 0.0:
            return origins, directions
        f = (float(self.focus_dist) if float(self.focus_dist) > 0.0
             else length(self.w))
        w_unit = normalize(self.w)
        cos_w = jnp.maximum(dot(directions, w_unit, keepdims=True), 1e-6)
        p_focus = origins + directions * (f / cos_w)
        offset = self.aperture * (lens_uv[..., 0:1] * self.u
                                  + lens_uv[..., 1:2] * self.v)
        o2 = origins + offset
        return o2, normalize(p_focus - o2)


@dataclasses.dataclass
class FlyCameraController:
    """Headless WASD/mouse fly camera (state machine parity with
    SDL_GraphicsWindowUpdateCamera).

    Drives a :class:`Camera` from programmatic input events instead of SDL;
    used by the interactive viewer and by animation scripts.
    """
    camera: Camera
    mouse_sensitivity: float = 0.002
    pitch_limit_degree: float = 85.0
    move_speed: float = 0.02
    speed_stride: float = 0.002

    def scroll(self, wheel_y: int) -> None:
        """Mouse wheel adjusts speed (SDL_GraphicsWindow.cu:124-131)."""
        if wheel_y > 0:
            self.move_speed += self.speed_stride
        else:
            self.move_speed = 0.0 if self.move_speed < self.speed_stride \
                else self.move_speed - self.speed_stride

    def update(self, mouse_dx: int = 0, mouse_dy: int = 0,
               forward=False, back=False, right=False, left=False,
               up=False, down=False) -> Camera:
        cam = self.camera
        new_center = cam.center
        new_target = cam.target

        if mouse_dx != 0 or mouse_dy != 0:
            view_dir = cam.target - cam.center
            u_n = normalize(cam.u)
            v_n = normalize(cam.v)
            w_n = normalize(cam.w)
            yaw = -float(mouse_dx) * self.mouse_sensitivity
            w_n = rotate_about_axis(w_n, v_n, yaw)
            pitch = -float(mouse_dy) * self.mouse_sensitivity
            w_n = rotate_about_axis(w_n, u_n, pitch)

            limit = float(degrees_to_radians(self.pitch_limit_degree))
            new_pitch = float(jnp.arcsin(jnp.clip(dot(w_n, v_n), -1.0, 1.0)))
            if abs(new_pitch) > limit:
                new_pitch = limit if new_pitch > 0 else -limit
                horiz = normalize(w_n - v_n * dot(w_n, v_n, keepdims=True))
                w_n = horiz * jnp.cos(new_pitch) + v_n * jnp.sin(new_pitch)
            new_target = new_center + w_n * length(view_dir)

        move = jnp.zeros(3, jnp.float32)
        w_m = normalize(cam.w)
        world_up = normalize(cam.up)
        projected = w_m - world_up * dot(w_m, world_up, keepdims=True)
        fwd = normalize(projected) if float(length(projected)) > EPS \
            else normalize(cam.u)
        if forward:
            move = move + fwd
        if back:
            move = move - fwd
        if right:
            move = move + cam.u
        if left:
            move = move - cam.u
        if up:
            move = move + cam.up
        if down:
            move = move - cam.up
        if float(jnp.sum(move * move)) > 0.0:
            translation = normalize(move) * self.move_speed
            new_center = new_center + translation
            new_target = new_target + translation

        self.camera = Camera.look_at(new_center, new_target, cam.up,
                                     aperture=cam.aperture,
                                     focus_dist=cam.focus_dist)
        return self.camera
