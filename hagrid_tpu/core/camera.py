"""Pinhole camera and primary-ray generation.

Equivalent of the reference's camera setup in src/main.cpp (eye/center/up/fov
CLI parameters feeding a primary-ray kernel). Ray generation is a pure jnp
function producing a flat SoA ray batch in scanline order — flat because the
wavefront pipeline treats rays as a 1D stream to sort/compact/shard.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .types import Rays


@dataclasses.dataclass(frozen=True)
class Camera:
    eye: tuple
    center: tuple
    up: tuple = (0.0, 1.0, 0.0)
    fov_deg: float = 60.0

    def basis(self):
        eye = np.asarray(self.eye, np.float32)
        fwd = np.asarray(self.center, np.float32) - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, np.asarray(self.up, np.float32))
        right = right / np.linalg.norm(right)
        up = np.cross(right, fwd)
        return eye, fwd, right, up


def _morton_deinterleave(within, bits: int = 5):
    """Split a 2*bits Morton code into (x, y). Pure index arithmetic
    (works for numpy and jnp inputs alike, stays fusable on device).

    Morton order within a block makes every power-of-two subsegment of
    the ray stream a square-ish pixel rectangle: a 512-ray tile is
    32x16, its 128-ray quarter 16x8 — the planner's frusta then shrink
    with the subdivision instead of degenerating into scanline strips."""
    x = within * 0
    y = within * 0
    for k in range(bits):
        x = x | (((within >> (2 * k)) & 1) << k)
        y = y | (((within >> (2 * k + 1)) & 1) << k)
    return x, y


def block_index(width: int, height: int, block: int = 32) -> np.ndarray:
    """Pixel index (y * width + x) of ray i in block order — the host-side
    inverse map for reassembling images from block-ordered hit arrays."""
    bpr = width // block
    i = np.arange(width * height)
    bi, within = i // (block * block), i % (block * block)
    wx, wy = _morton_deinterleave(within)
    gx = (bi % bpr) * block + wx
    gy = (bi // bpr) * block + wy
    return gy * width + gx


def primary_rays(cam: Camera, width: int, height: int,
                 jitter=None, order: str = "scanline") -> Rays:
    """Generate width*height primary rays.

    order: "scanline" (y-major; image writers expect this) or "block"
    (32x32 image tiles, contiguous per tile, Morton-ordered within the
    tile) — block order gives the packet tracer narrow frusta at every
    power-of-two tile subdivision; reassemble images with `block_index`.
    Falls back to scanline when the size isn't a multiple of 32.
    jitter: optional f32[H*W, 2] subpixel offsets in [0,1) for
    antialiasing / path tracing; defaults to pixel centers.
    """
    eye, fwd, right, up = cam.basis()
    tan_half = np.tan(np.radians(cam.fov_deg) * 0.5)
    aspect = width / height

    if order == "block" and width % 32 == 0 and height % 32 == 0:
        # Pure index arithmetic — no gather, so ray gen stays fusable.
        b = 32
        bpr = width // b
        i = jnp.arange(width * height, dtype=jnp.int32)
        bi = i // (b * b)
        within = i % (b * b)
        wx, wy = _morton_deinterleave(within)
        gx = ((bi % bpr) * b + wx).astype(jnp.float32)
        gy = ((bi // bpr) * b + wy).astype(jnp.float32)
    else:
        px = jnp.arange(width, dtype=jnp.float32)
        py = jnp.arange(height, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(px, py)  # [H, W]
        gx = gx.reshape(-1)
        gy = gy.reshape(-1)
    if jitter is None:
        ox = oy = 0.5
    else:
        ox = jitter[:, 0]
        oy = jitter[:, 1]
    # NDC in [-1, 1], y flipped so row 0 is the top of the image.
    ndc_x = (2.0 * (gx + ox) / width - 1.0) * tan_half * aspect
    ndc_y = (1.0 - 2.0 * (gy + oy) / height) * tan_half

    d = (ndc_x[:, None] * jnp.asarray(right)
         + ndc_y[:, None] * jnp.asarray(up)
         + jnp.asarray(fwd))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    org = jnp.broadcast_to(jnp.asarray(eye), d.shape)
    return Rays.make(org, d)
