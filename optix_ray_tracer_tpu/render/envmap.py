"""HDR environment map (equirectangular) — benchmark config 5 lighting.

The reference's miss program returns a constant background color
(shader/Shader.cu:276-287); the env map generalizes it: on a miss the ray
direction looks up an equirectangular latitude-longitude radiance image
with bilinear filtering.  Includes a tiny dependency-free Radiance .hdr
(RGBE) reader and a procedural sky generator for tests/benchmarks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from optix_ray_tracer_tpu.utils.vecmath import PI


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvMap:
    """Equirectangular radiance image: (H, W, 3) float32, +z up,
    phi = atan2(y, x) maps to the u axis."""
    image: jax.Array

    def sample(self, directions):
        """Bilinear lookup for (..., 3) unit directions -> (..., 3) radiance."""
        img = self.image
        h, w = img.shape[0], img.shape[1]
        x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
        phi = jnp.arctan2(y, x)                    # [-pi, pi]
        theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))  # [0, pi], 0 = +z (up)
        u = (phi / (2.0 * PI) + 0.5) * w - 0.5
        v = (theta / PI) * h - 0.5

        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        fu = (u - u0)[..., None]
        fv = (v - v0)[..., None]
        u0i = jnp.mod(u0.astype(jnp.int32), w)
        u1i = jnp.mod(u0i + 1, w)
        v0i = jnp.clip(v0.astype(jnp.int32), 0, h - 1)
        v1i = jnp.clip(v0i + 1, 0, h - 1)

        c00 = img[v0i, u0i]
        c01 = img[v0i, u1i]
        c10 = img[v1i, u0i]
        c11 = img[v1i, u1i]
        top = c00 * (1 - fu) + c01 * fu
        bot = c10 * (1 - fu) + c11 * fu
        return top * (1 - fv) + bot * fv


def constant_env(color) -> EnvMap:
    return EnvMap(image=jnp.broadcast_to(
        jnp.asarray(color, jnp.float32), (2, 4, 3)).copy())


def gradient_sky(zenith=(0.35, 0.55, 0.95), horizon=(0.9, 0.9, 0.95),
                 ground=(0.35, 0.30, 0.25), height: int = 64,
                 width: int = 128, sun_dir=None, sun_radiance=(80, 76, 70),
                 sun_cos: float = 0.9995) -> EnvMap:
    """Procedural sky for tests/benchmarks (no assets needed)."""
    theta = (np.arange(height) + 0.5) / height * np.pi
    z = np.cos(theta)
    t = np.clip(z, 0.0, 1.0)[:, None]
    sky = (np.asarray(horizon) * (1 - t) + np.asarray(zenith) * t)
    img = np.where(z[:, None] >= 0, sky, np.asarray(ground))
    img = np.repeat(img[:, None, :], width, axis=1).astype(np.float32)

    if sun_dir is not None:
        sd = np.asarray(sun_dir, np.float64)
        sd /= np.linalg.norm(sd)
        phi = (np.arange(width) + 0.5) / width * 2 * np.pi - np.pi
        dirs = np.stack(np.broadcast_arrays(
            np.sin(theta)[:, None] * np.cos(phi)[None, :],
            np.sin(theta)[:, None] * np.sin(phi)[None, :],
            np.cos(theta)[:, None] * np.ones_like(phi)[None, :]), -1)
        mask = (dirs @ sd) > sun_cos
        img[mask] = sun_radiance
    return EnvMap(image=jnp.asarray(img))


def read_hdr(path: str) -> EnvMap:
    """Minimal Radiance RGBE (.hdr) reader (RLE and flat scanlines)."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"#?"):
        raise ValueError("not a Radiance HDR file")
    # header ends at blank line; next line is the resolution spec
    head_end = data.find(b"\n\n")
    if head_end < 0:
        raise ValueError("bad HDR header")
    rest = data[head_end + 2:]
    nl = rest.find(b"\n")
    res = rest[:nl].split()
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"unsupported HDR layout: {res}")
    h, w = int(res[1]), int(res[3])
    payload = rest[nl + 1:]

    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if (pos + 4 <= len(payload) and payload[pos] == 2
                and payload[pos + 1] == 2
                and (payload[pos + 2] << 8 | payload[pos + 3]) == w):
            pos += 4  # new-style RLE scanline
            for ch in range(4):
                x = 0
                while x < w:
                    count = payload[pos]
                    pos += 1
                    if count > 128:   # run
                        rgbe[y, x:x + count - 128, ch] = payload[pos]
                        pos += 1
                        x += count - 128
                    else:             # literal
                        rgbe[y, x:x + count, ch] = np.frombuffer(
                            payload, np.uint8, count, pos)
                        pos += count
                        x += count
        else:  # flat scanline
            row = np.frombuffer(payload, np.uint8, w * 4, pos).reshape(w, 4)
            rgbe[y] = row
            pos += w * 4

    mantissa = rgbe[..., :3].astype(np.float32)
    exponent = rgbe[..., 3].astype(np.int32)
    scale = np.where(exponent > 0,
                     np.ldexp(1.0, exponent - 136), 0.0).astype(np.float32)
    return EnvMap(image=jnp.asarray(mantissa * scale[..., None]))
