"""Post-processing: Reinhard tonemap, gamma encode, bilateral denoise,
u8 quantization.

Counterparts of the reference post stack (reference: src/tonemap.rs:11-27,
src/filter.rs:25-58, src/renderer.rs:64-90), as pure batched image ops.
The whole chain runs on-device and fuses into a couple of VPU loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..utils.colors import linear_to_gamma, luminance
from ..utils.vec import Vec3


def tonemap_reinhard(c: Vec3, exposure: float, white_point: float) -> Vec3:
    """Extended Reinhard (tonemap.rs:22-27)."""
    c = c * exposure
    lum = luminance(c)
    wp = white_point * exposure
    scale = (lum / (wp * wp) + 1.0) / (lum + 1.0)
    return (c * scale).saturate()


def tonemap(c: Vec3, cfg: RenderConfig) -> Vec3:
    if cfg.tonemap_mode == "none":
        return c
    if cfg.tonemap_mode == "reinhard":
        return tonemap_reinhard(c, cfg.tonemap_exposure, cfg.tonemap_white_point)
    raise ValueError(f"unknown tonemap mode {cfg.tonemap_mode!r}")


def _gaussian(x, sigma: float):
    s2 = sigma * sigma
    return jnp.exp(-(x * x) / (2.0 * s2)) / (2.0 * jnp.pi * s2)


def bilateral(img: Vec3, cfg: RenderConfig) -> Vec3:
    """One bilateral pass over an [H,W] Vec3 image (filter.rs:32-58).

    Runs in gamma LDR space like the reference (renderer.rs:69-81).
    Edge handling defaults to correct clamping; with
    `bilateral_reference_edge_bug` the reference's u32-underflow behavior is
    reproduced (out-of-range-low neighbors read the opposite edge,
    filter.rs:43-44)."""
    h, w = img.x.shape
    d = cfg.bilateral_diameter
    half = d // 2
    cur_sum = img.sum()
    sum_scale = 1.0 / 3.0

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]

    filtered = Vec3(
        jnp.zeros_like(img.x), jnp.zeros_like(img.x), jnp.zeros_like(img.x)
    )
    w_p = jnp.zeros_like(img.x)
    for i in range(d):
        for j in range(d):
            nx = xs - (half - i)
            ny = ys - (half - j)
            if cfg.bilateral_reference_edge_bug:
                nx = jnp.where(nx < 0, w - 1, jnp.minimum(nx, w - 1))
                ny = jnp.where(ny < 0, h - 1, jnp.minimum(ny, h - 1))
            else:
                nx = jnp.clip(nx, 0, w - 1)
                ny = jnp.clip(ny, 0, h - 1)
            neighbor = Vec3(img.x[ny, nx], img.y[ny, nx], img.z[ny, nx])
            g_i = _gaussian(
                sum_scale * (neighbor.sum() - cur_sum), cfg.bilateral_sigma_i
            )
            dist = jnp.sqrt(
                ((xs - nx) ** 2 + (ys - ny) ** 2).astype(img.x.dtype)
            )
            g_s = _gaussian(dist, cfg.bilateral_sigma_s)
            wgt = g_i * g_s
            filtered = filtered + neighbor * wgt
            w_p = w_p + wgt
    return filtered / w_p


def finalize_image(acc: Vec3, sampling, cfg: RenderConfig) -> jax.Array:
    """HDR accumulation buffer [H,W] -> u8 image [H,W,3]
    (renderer.rs:64-90): scale, tonemap, gamma, bilateral, quantize."""
    scale = 1.0 / (
        jnp.asarray(sampling, acc.x.dtype) * cfg.rays_per_pixel_per_pass
    )
    hdr = acc * scale
    ldr = tonemap(hdr, cfg)
    g = linear_to_gamma(ldr)
    for _ in range(cfg.bilateral_iterations):
        g = bilateral(g, cfg)
    # (255 * saturate(v)) as u8 truncates toward zero (color.rs:10-16)
    q = g.saturate() * 255.0
    return jnp.stack(
        [q.x.astype(jnp.uint8), q.y.astype(jnp.uint8), q.z.astype(jnp.uint8)],
        axis=-1,
    )
