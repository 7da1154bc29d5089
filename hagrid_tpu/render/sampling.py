"""Sampling utilities for secondary rays (AO, shadows, path tracing)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def orthonormal_basis(n):
    """Branchless ONB from unit normals n f32[N,3] (Frisvad/Duff et al.)."""
    s = jnp.where(n[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t = jnp.stack([1.0 + s * n[:, 0] * n[:, 0] * a, s * b,
                   -s * n[:, 0]], axis=-1)
    bt = jnp.stack([b, s + n[:, 1] * n[:, 1] * a, -n[:, 1]], axis=-1)
    return t, bt


def cosine_hemisphere(key, n):
    """Cosine-weighted directions about unit normals n f32[N,3]."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (n.shape[0],))
    u2 = jax.random.uniform(k2, (n.shape[0],))
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    t, bt = orthonormal_basis(n)
    return x[:, None] * t + y[:, None] * bt + z[:, None] * n


def face_forward(n, dirs):
    """Flip normals to face against the incoming ray direction."""
    sign = jnp.where(jnp.sum(n * dirs, axis=-1, keepdims=True) > 0, -1.0,
                     1.0)
    return n * sign


def hit_points_normals(rays, hits, tri_n):
    """Surface points and outward unit normals for hit rays.

    tri_n: f32[T,3] unnormalized geometric normals. Misses get zeros."""
    found = hits.tri_id >= 0
    tid = jnp.maximum(hits.tri_id, 0)
    n = tri_n[tid]
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-20)
    n = face_forward(n, rays.dir)
    t = jnp.where(found, hits.t, 0.0)
    p = rays.org + t[:, None] * rays.dir
    return p, n, found
