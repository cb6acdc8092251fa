"""Color transforms: linear <-> sRGB, float -> uint8 framebuffer conversion.

Matches the exact constants of the reference's conversion kernels
(``include/Global/DeviceFunctions.cuh:153-212``): gamma 1/2.4, linear cutoff
0.0031308, 12.92 linear slope, 1.055/-0.055 power segment, and the
``min(uint(s * 256), 255)`` byte quantization of ``colorToUchar4``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


#: Rec.709 luma weights — the single shared definition (light selection,
#: env-map importance tables, adaptive-sampling error metric).
LUMA_709 = np.asarray([0.2126, 0.7152, 0.0722], np.float32)


def luminance(rgb):
    """Rec.709 luminance of (..., 3) linear RGB; works for numpy and jnp."""
    return rgb @ LUMA_709


def linear_to_srgb(c):
    """Per-channel linear->sRGB with reference constants; clips to [0, 1]."""
    c = jnp.clip(c, 0.0, 1.0)
    lo = 12.92 * c
    hi = 1.055 * jnp.power(jnp.maximum(c, 1e-30), 1.0 / 2.4) - 0.055
    return jnp.clip(jnp.where(c < 0.0031308, lo, hi), 0.0, 1.0)


def srgb_to_linear(s):
    s = jnp.clip(s, 0.0, 1.0)
    lo = s / 12.92
    hi = jnp.power((s + 0.055) / 1.055, 2.4)
    return jnp.where(s <= 0.04045, lo, hi)


def color_to_float4(rgb):
    """sRGB-encode an (..., 3) linear color and append alpha=1.

    Semantics of ``colorToFloat4`` (DeviceFunctions.cuh:188-210), which the
    raygen program applies before writing the color buffer
    (shader/Shader.cu:269).
    """
    srgb = linear_to_srgb(rgb[..., :3])
    alpha = jnp.ones_like(srgb[..., :1])
    return jnp.concatenate([srgb, alpha], axis=-1)


def color_to_uint8(rgb):
    """sRGB-encode and quantize to uint8 RGBA.

    Semantics of ``colorToUchar4`` (DeviceFunctions.cuh:153-185):
    ``min(uint(srgb * 256), 255)``.
    """
    srgb = linear_to_srgb(rgb[..., :3])
    q = jnp.minimum((srgb * 256.0).astype(jnp.uint32), 255).astype(jnp.uint8)
    alpha = jnp.full_like(q[..., :1], 255)
    return jnp.concatenate([q, alpha], axis=-1)


def write_ppm(path, rgb_uint8: np.ndarray) -> None:
    """Write an (H, W, >=3) uint8 image as binary PPM (dependency-free)."""
    arr = np.asarray(rgb_uint8)[..., :3]
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(arr.astype(np.uint8).tobytes())


def png_bytes(rgba_uint8: np.ndarray) -> bytes:
    """Encode an image as PNG in memory (zlib + struct only, no imaging deps).

    Replaces the reference's swapchain present path — on TPU the framebuffer
    is fetched from HBM once per flush and encoded on host.
    """
    import struct
    import zlib

    arr = np.asarray(rgba_uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, c = arr.shape
    if c == 3:
        arr = np.concatenate([arr, np.full((h, w, 1), 255, np.uint8)], axis=-1)
        c = 4
    color_type = {1: 0, 2: 4, 4: 6}.get(c, 6)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def write_png(path, rgba_uint8: np.ndarray) -> None:
    """Write an image as a PNG file (see :func:`png_bytes`)."""
    with open(path, "wb") as f:
        f.write(png_bytes(rgba_uint8))
