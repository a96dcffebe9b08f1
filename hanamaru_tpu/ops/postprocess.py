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

    def clamp_idx(idx, size):
        if cfg.bilateral_reference_edge_bug:
            # u32 underflow parity: out-of-range-low wraps huge and clamps
            # to the opposite edge (filter.rs:43-44)
            return jnp.where(idx < 0, size - 1, jnp.minimum(idx, size - 1))
        return jnp.clip(idx, 0, size - 1)

    def shift_axis(a, off, axis, size):
        """a indexed at clamp(pos + off) along axis — as concatenated
        slices (compiles to cheap copies; a 2M-index gather formulation
        stalls the TPU compiler)."""
        if off == 0:
            return a
        edge_lo = (
            jax.lax.index_in_dim(a, size - 1, axis)  # bug mode wraps to max
            if cfg.bilateral_reference_edge_bug
            else jax.lax.index_in_dim(a, 0, axis)
        )
        edge_hi = jax.lax.index_in_dim(a, size - 1, axis)
        if off < 0:
            body = jax.lax.slice_in_dim(a, 0, size + off, axis=axis)
            return jnp.concatenate([edge_lo] * (-off) + [body], axis=axis)
        body = jax.lax.slice_in_dim(a, off, size, axis=axis)
        return jnp.concatenate([body] + [edge_hi] * off, axis=axis)

    def shift2(a, oy, ox):
        return shift_axis(shift_axis(a, oy, 0, h), ox, 1, w)

    filtered = Vec3(
        jnp.zeros_like(img.x), jnp.zeros_like(img.x), jnp.zeros_like(img.x)
    )
    w_p = jnp.zeros_like(img.x)
    for i in range(d):
        for j in range(d):
            ox = i - half
            oy = j - half
            neighbor = Vec3(
                shift2(img.x, oy, ox), shift2(img.y, oy, ox), shift2(img.z, oy, ox)
            )
            g_i = _gaussian(
                sum_scale * (neighbor.sum() - cur_sum), cfg.bilateral_sigma_i
            )
            # spatial weight uses the *clamped* neighbor coordinates like
            # the reference (filter.rs:49): distance shrinks at the edges
            nx = clamp_idx(xs + ox, w)
            ny = clamp_idx(ys + oy, h)
            dist = jnp.sqrt(((xs - nx) ** 2 + (ys - ny) ** 2).astype(img.x.dtype))
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
