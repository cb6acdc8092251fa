"""SRT transforms and quaternion utilities.

Reproduces the semantics of the reference host math
(``include/Global/DeviceFunctions.cuh:24-148`` — shift/scale/rotate matrix
constructors composed as ``shift * rotate(X)*rotate(Y)*rotate(Z) * scale``
truncated to the top 3 rows of a 4x4, i.e. a row-major 3x4 affine transform)
and the Time-mode animation math (``src/Global/RendererTime.cu:297-370`` —
quaternion slerp + quat->Euler-XYZ-degrees conversion).

Everything is batched: transforms are ``(..., 3, 4)`` float32 arrays,
quaternions are ``(..., 4)`` in (w, x, y, z) order (reference order,
``RendererTime.cu:296-297``).
"""

from __future__ import annotations

import jax.numpy as jnp

from optix_ray_tracer_tpu.utils.vecmath import degrees_to_radians, radians_to_degrees, PI


def rotation_matrix_euler_xyz_degrees(rotate_deg):
    """3x3 rotation from Euler angles in degrees, composed Rx @ Ry @ Rz.

    Matches ``Matrix::constructRotateMatrix(float3)`` which computes
    ``mx * my * mz`` (DeviceFunctions.cuh:128-133).
    """
    rotate_deg = jnp.asarray(rotate_deg, jnp.float32)
    rx, ry, rz = (degrees_to_radians(rotate_deg[..., i]) for i in range(3))
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)

    mx = jnp.stack([
        jnp.stack([one, zero, zero], -1),
        jnp.stack([zero, cx, -sx], -1),
        jnp.stack([zero, sx, cx], -1)], -2)
    my = jnp.stack([
        jnp.stack([cy, zero, sy], -1),
        jnp.stack([zero, one, zero], -1),
        jnp.stack([-sy, zero, cy], -1)], -2)
    mz = jnp.stack([
        jnp.stack([cz, -sz, zero], -1),
        jnp.stack([sz, cz, zero], -1),
        jnp.stack([zero, zero, one], -1)], -2)
    return mx @ my @ mz


def srt_transform(shift, rotate_deg, scale):
    """Row-major 3x4 affine = translate(shift) @ rotate(deg XYZ) @ scale.

    Semantics of ``MathHelper::constructTransformMatrix``
    (DeviceFunctions.cuh:136-148).  ``shift``/``rotate_deg``/``scale`` are
    (..., 3); returns (..., 3, 4).
    """
    shift = jnp.asarray(shift, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rot = rotation_matrix_euler_xyz_degrees(rotate_deg)
    linear = rot * scale[..., None, :]  # R @ diag(s)
    return jnp.concatenate([linear, shift[..., :, None]], axis=-1)


def identity_transform(batch_shape=()):
    eye = jnp.concatenate([jnp.eye(3, dtype=jnp.float32),
                           jnp.zeros((3, 1), jnp.float32)], axis=-1)
    return jnp.broadcast_to(eye, (*batch_shape, 3, 4))


def apply_transform_point(t, p):
    """Apply (..., 3, 4) affine to (..., 3) points."""
    return jnp.einsum('...ij,...j->...i', t[..., :, :3], p) + t[..., :, 3]


def apply_transform_vector(t, v):
    """Apply only the linear part (directions don't translate)."""
    return jnp.einsum('...ij,...j->...i', t[..., :, :3], v)


def invert_transform(t):
    """Invert a (..., 3, 4) affine transform (for world->object ray mapping).

    The reference never needs this (OptiX handles instance transforms in the
    BVH); our two-level traversal transforms rays into object space instead.
    """
    linear = t[..., :, :3]
    inv_linear = jnp.linalg.inv(linear)
    inv_shift = -jnp.einsum('...ij,...j->...i', inv_linear, t[..., :, 3])
    return jnp.concatenate([inv_linear, inv_shift[..., :, None]], axis=-1)


def compose_transforms(a, b):
    """a @ b for 3x4 affines (apply b first)."""
    linear = a[..., :, :3] @ b[..., :, :3]
    shift = jnp.einsum('...ij,...j->...i', a[..., :, :3], b[..., :, 3]) + a[..., :, 3]
    return jnp.concatenate([linear, shift[..., :, None]], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions — (w, x, y, z) order, matching RendererTime.cu:296.
# ---------------------------------------------------------------------------

def quat_slerp(q1, q2, t):
    """Spherical linear interpolation, semantics of ``slerp``
    (RendererTime.cu:297-340): shortest-path sign flip, nlerp fallback when
    the quaternions are nearly parallel (dot > 0.9995)."""
    q1 = jnp.asarray(q1, jnp.float32)
    q2 = jnp.asarray(q2, jnp.float32)
    t = jnp.asarray(t, jnp.float32)

    d = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q2 = jnp.where(d < 0.0, -q2, q2)
    d = jnp.abs(d)

    # nlerp branch
    lin = q1 + t[..., None] * (q2 - q1)
    mag = jnp.sqrt(jnp.sum(lin * lin, axis=-1, keepdims=True))
    nlerp = jnp.where(mag > 0.0, lin / jnp.maximum(mag, 1e-30), lin)

    # slerp branch
    d_c = jnp.clip(d, -1.0, 1.0)
    theta0 = jnp.arccos(d_c)
    theta = theta0 * t[..., None]
    sin_theta0 = jnp.sin(theta0)
    safe_sin0 = jnp.where(jnp.abs(sin_theta0) < 1e-12, 1.0, sin_theta0)
    s0 = jnp.cos(theta) - d_c * jnp.sin(theta) / safe_sin0
    s1 = jnp.sin(theta) / safe_sin0
    slerped = s0 * q1 + s1 * q2

    return jnp.where(d > 0.9995, nlerp, slerped)


def quat_to_euler_degrees(q):
    """Quaternion -> Euler XYZ (roll, pitch, yaw) in degrees.

    Semantics of ``quatToEuler`` (RendererTime.cu:343-370) including the
    +-90-degree pitch clamp when ``|sinp| >= 1``.
    """
    w, x, y, z = (q[..., i] for i in range(4))
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (w * y - z * x)
    pitch = jnp.where(jnp.abs(sinp) >= 1.0,
                      jnp.sign(sinp) * (PI / 2.0),
                      jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)))

    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)

    return radians_to_degrees(jnp.stack([roll, pitch, yaw], axis=-1))


def quat_to_rotation_matrix(q):
    """Direct quaternion -> 3x3 rotation (normalized first).

    Faster/exacter path than quat->euler->matrix; the frontends use the
    euler path when bit-parity with the reference matters and this otherwise.
    """
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)
    w, x, y, z = (q[..., i] for i in range(4))
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)
