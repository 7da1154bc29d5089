"""Brute-force intersection oracle.

The reference has no test suite (see SURVEY.md §4); our correctness story is
anchored by this oracle: closest-hit and any-hit computed by testing every
ray against every triangle. O(N*T) — use only for small scenes/tests. Tie
breaking matches the traversal kernels: strictly smaller t wins, equal t
resolved by smaller triangle id, so grid traversal can be compared
hit-for-hit against the oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core.intersect import moller_trumbore
from .core.types import Hits, Rays, Triangles


def _closest_one(org, dir, tmin, tmax, tris: Triangles) -> Hits:
    hit, t, u, v = moller_trumbore(org[None, :], dir[None, :],
                                   tris.v0, tris.e1, tris.e2, tmin, tmax)
    t_masked = jnp.where(hit, t, jnp.inf)
    # argmin breaks ties by lowest index, which is the smaller tri id.
    best = jnp.argmin(t_masked)
    found = t_masked[best] < jnp.inf
    return Hits(
        tri_id=jnp.where(found, best.astype(jnp.int32), jnp.int32(-1)),
        t=jnp.where(found, t_masked[best], jnp.inf),
        u=jnp.where(found, u[best], 0.0),
        v=jnp.where(found, v[best], 0.0),
    )


@jax.jit
def closest_hit(rays: Rays, tris: Triangles) -> Hits:
    return jax.vmap(lambda o, d, t0, t1: _closest_one(o, d, t0, t1, tris))(
        rays.org, rays.dir, rays.tmin, rays.tmax)


@jax.jit
def any_hit(rays: Rays, tris: Triangles) -> jnp.ndarray:
    """bool[N]: True where any triangle blocks the ray within (tmin, tmax)."""
    def one(o, d, t0, t1):
        hit, _, _, _ = moller_trumbore(o[None, :], d[None, :],
                                       tris.v0, tris.e1, tris.e2, t0, t1)
        return jnp.any(hit)
    return jax.vmap(one)(rays.org, rays.dir, rays.tmin, rays.tmax)
