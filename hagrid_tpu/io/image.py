"""Image output (PNG + PPM) and shading helpers.

The reference writes the rendered frame from main.cpp; we emit PNG via a
small dependency-free encoder (zlib is in the stdlib) and PPM as the
lowest-common-denominator debug format.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def to_u8(img: np.ndarray) -> np.ndarray:
    """f32[H,W,3] in [0,1] -> u8[H,W,3] with gamma 2.2."""
    img = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    return (np.power(img, 1.0 / 2.2) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray):
    """img: u8[H,W,3] or f32[H,W,3] in [0,1]."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = to_u8(img)
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        out = struct.pack(">I", len(payload)) + tag + payload
        return out + struct.pack(">I", zlib.crc32(tag + payload))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(chunk(b"IHDR", ihdr))
        fh.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        fh.write(chunk(b"IEND", b""))


def write_ppm(path: str, img: np.ndarray):
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = to_u8(img)
    h, w, _ = img.shape
    with open(path, "wb") as fh:
        fh.write(f"P6\n{w} {h}\n255\n".encode())
        fh.write(img.tobytes())


def shade_eyelight(hits_tri, hits_t, tri_n, ray_dir, width, height):
    """Eye-light (headlight) shading, the reference's default debug shading:
    brightness = |cos(angle between geometric normal and ray)|.

    hits_tri i32[N], tri_n f32[T,3] unnormalized normals, ray_dir f32[N,3].
    Returns f32[H,W,3].
    """
    n = tri_n[np.maximum(hits_tri, 0)]
    n = n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-20)
    c = np.abs(np.sum(n * np.asarray(ray_dir), axis=-1))
    c = np.where(hits_tri >= 0, c, 0.0).astype(np.float32)
    img = np.repeat(c[:, None], 3, axis=1)
    return img.reshape(height, width, 3)
