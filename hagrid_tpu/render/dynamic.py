"""Dynamic geometry: per-frame animated meshes with full grid rebuilds.

The reference rebuilds its grid every frame for animated scenes
(SURVEY.md §3.4); the build must therefore be fast and allocation-free
after frame one. Here vertex animation is a jitted transform and the
rebuild reuses the session's capacity buckets, so steady-state frames
compile nothing and allocate nothing new.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import Triangles


@jax.jit
def wave_deform(vertices: jnp.ndarray, time: jnp.ndarray,
                amplitude: float = 0.25, freq: float = 1.5) -> jnp.ndarray:
    """Benchmark deformation: a traveling sine displacement (stands in for
    skinning/cloth updates; any f(verts, t) works)."""
    v = vertices
    phase = v[:, 0] * freq + v[:, 2] * 0.7 * freq
    dy = amplitude * jnp.sin(phase + time * 2.0 * jnp.pi)
    return v.at[:, 1].add(dy)


class AnimatedScene:
    """Owns base geometry; produces per-frame Triangles on device."""

    def __init__(self, vertices, faces, deform=wave_deform):
        self.base_vertices = jnp.asarray(vertices, jnp.float32)
        self.faces = jnp.asarray(faces, jnp.int32)
        self.deform = deform

    def frame(self, time: float) -> Triangles:
        v = self.deform(self.base_vertices, jnp.float32(time))
        return Triangles.from_mesh(v, self.faces)


def animate(session, scene: AnimatedScene, times):
    """Run the per-frame rebuild loop; yields (time, grid_total_refs)."""
    for t in times:
        tris = scene.frame(t)
        total = session.rebuild(tris)
        yield t, total
