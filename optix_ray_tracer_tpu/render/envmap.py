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
    phi = atan2(y, x) maps to the u axis.

    The sampling tables (built by the factory functions when the map has
    contrast worth importance-sampling) enable luminance importance
    sampling for NEE — the variance killer for small bright sources (a
    sun disk covers ~1e-3 of cosine-sampling's mass but most of the
    CDF's).  The texel distribution is stored as a TWO-LEVEL CDF over
    3x3-max-filtered luminance x sin(theta) weights (the max filter keeps
    the piecewise-constant pdf >= any bilinearly reachable radiance, so
    texel edges next to a bright source cannot firefly):

    - ``block_cdf`` (NB,): CDF over blocks of 128 consecutive texels;
    - ``cond_cdf`` (NB, 128): per-block texel CDF, renormalized to [0, 1].

    A single flat (H*W,) float32 CDF would lose dim texels on
    production-size HDR maps (a 2048x4096 map has mean texel probability
    ~1e-7, below float32 ULP near 1.0 — zero-width spans are never
    sampled while the MIS counterpart still claims pdf > 0 = energy
    loss); per-block renormalization keeps every stored span far above
    ULP.  ``pdf_tex`` is the per-texel pdf in (u, v) SPACE — the
    solid-angle pdf is pdf_tex / (2 pi^2 sin(theta)) evaluated at the
    ACTUAL sampled theta (not the texel center: v is jittered inside the
    texel, so the density the sampler realizes varies with sin(theta)
    within it; using the center value would bias coarse maps).
    ``EnvMap(image=...)`` without tables still works everywhere; NEE
    simply stays off for it (as it does for near-constant maps, where an
    extra shadow wave buys nothing over the cosine lobe)."""
    image: jax.Array
    block_cdf: jax.Array | None = None
    cond_cdf: jax.Array | None = None
    pdf_tex: jax.Array | None = None

    BLOCK = 128  # texels per CDF block (class constant, not a leaf)

    @property
    def can_sample(self) -> bool:
        return self.block_cdf is not None

    def sample_direction(self, u_block, u_texel, u_jit, v_jit):
        """Importance-sample directions from the two-level luminance CDF.

        Four (...,) uniforms: ``u_block`` picks the 128-texel block
        (one searchsorted on the block CDF), ``u_texel`` picks the texel
        inside it (7-step branchless binary search on the block's
        renormalized CDF row — per-lane gathers, no (R, 128) gather),
        ``u_jit``/``v_jit`` jitter inside the texel.  Returns
        (dir (..., 3) unit, pdf_solid_angle (...,))."""
        h, w = self.image.shape[0], self.image.shape[1]
        k = self.BLOCK
        nb = self.block_cdf.shape[0]
        blk = jnp.clip(jnp.searchsorted(self.block_cdf, u_block),
                       0, nb - 1).astype(jnp.int32)
        # branchless lower_bound over the block's K-entry CDF row
        cond = self.cond_cdf.reshape(-1)
        j = jnp.zeros_like(blk)
        step = k // 2
        while step >= 1:
            t = j + step
            val = cond[blk * k + (t - 1)]
            j = jnp.where(val < u_texel, t, j)
            step //= 2
        idx = jnp.clip(blk * k + j, 0, h * w - 1)
        y = idx // w
        x = idx - y * w
        u = (x.astype(jnp.float32) + u_jit) / w
        v = (y.astype(jnp.float32) + v_jit) / h
        theta = v * PI
        phi = (u - 0.5) * (2.0 * PI)
        st = jnp.sin(theta)
        direction = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi),
                               jnp.cos(theta)], axis=-1)
        pdf = self.pdf_tex.reshape(-1)[idx] / (
            2.0 * PI * PI * jnp.maximum(st, 1e-6))
        return direction, pdf

    def pdf_solid_angle(self, directions):
        """pdf that :meth:`sample_direction` produced these (..., 3) unit
        directions — the MIS counterpart for BSDF rays that escape."""
        h, w = self.image.shape[0], self.image.shape[1]
        x_, y_, z_ = (directions[..., 0], directions[..., 1],
                      directions[..., 2])
        phi = jnp.arctan2(y_, x_)
        theta = jnp.arccos(jnp.clip(z_, -1.0, 1.0))
        u = phi / (2.0 * PI) + 0.5
        v = theta / PI
        xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        return self.pdf_tex[yi, xi] / (
            2.0 * PI * PI * jnp.maximum(jnp.sin(theta), 1e-6))

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


def _with_tables(img: np.ndarray) -> EnvMap:
    """Build the importance-sampling tables for an (H, W, 3) radiance image
    (host-side, at env construction).

    Texel weights are 3x3-max-filtered luminance (wraparound in phi,
    clamped in theta) x sin(theta): any radiance the bilinear lookup can
    reach inside a texel comes from that texel's 3x3 neighborhood, so the
    max filter bounds radiance/pdf and kills edge fireflies.  The sin
    factor is the equirectangular area measure; it cancels out of the
    solid-angle pdf.

    Near-constant maps (max luminance < 1.05x mean) skip the tables:
    their "importance" sample is uniform over the sphere — strictly worse
    than the cosine lobe it would be MIS'd against — so env NEE would pay
    a full extra shadow wave per diffuse vertex for nothing."""
    from optix_ray_tracer_tpu.utils.color import luminance

    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    lum = luminance(img)
    if not float(lum.max()) > 1.05 * float(lum.mean()):
        return EnvMap(image=jnp.asarray(img))
    pad = np.concatenate([lum[:, -1:], lum, lum[:, :1]], axis=1)
    pad = np.concatenate([pad[:1], pad, pad[-1:]], axis=0)
    mx = np.max(np.stack([pad[dy:dy + h, dx:dx + w]
                          for dy in range(3) for dx in range(3)]), axis=0)
    sin_t = np.sin((np.arange(h) + 0.5) / h * np.pi)
    wgt = mx.astype(np.float64) * sin_t[:, None] + 1e-30
    total = wgt.sum()
    # (u, v)-space pdf; divided by 2 pi^2 sin(theta_actual) at use sites
    pdf_tex = (wgt * (h * w) / total).astype(np.float32)

    # two-level CDF (see EnvMap docstring): pad the flat weight vector to
    # a multiple of BLOCK with zero-probability texels (their renormalized
    # conditional spans are zero-width, so the lower_bound never lands on
    # them; a fully-zero pad block gets a zero-width block span)
    k = EnvMap.BLOCK
    flat = wgt.reshape(-1)
    n_pad = (-len(flat)) % k
    if n_pad:
        flat = np.concatenate([flat, np.zeros(n_pad)])
    blocks = flat.reshape(-1, k)
    block_w = blocks.sum(axis=1)
    block_cdf = np.cumsum(block_w) / total
    block_cdf[-1] = 1.0
    cond_cdf = np.cumsum(blocks, axis=1) / np.maximum(
        block_w[:, None], 1e-300)
    cond_cdf[:, -1] = 1.0
    return EnvMap(image=jnp.asarray(img),
                  block_cdf=jnp.asarray(block_cdf.astype(np.float32)),
                  cond_cdf=jnp.asarray(cond_cdf.astype(np.float32)),
                  pdf_tex=jnp.asarray(pdf_tex))


def constant_env(color) -> EnvMap:
    return _with_tables(np.broadcast_to(
        np.asarray(color, np.float32), (2, 4, 3)))


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
    return _with_tables(img)


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
    return _with_tables(mantissa * scale[..., None])
