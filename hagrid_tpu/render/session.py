"""RenderSession: the engine facade (build + trace under one object).

Counterpart of the reference's main.cpp orchestration: owns the current
acceleration structure, rebuilds it per frame (static capacities — the
TPU replacement for the reference MemManager slot allocator: iteration 2+
is allocation-free because shapes never change), and dispatches traversal
on the best available path. bench.py, the CLI, and __graft_entry__ all go
through this facade so the fastest path is always the one benched.
"""

from __future__ import annotations

import dataclasses

import jax

from ..core.types import Hits, Rays, Triangles
from ..grid.uniform import UniformGrid, build_uniform, trace_uniform
from ..utils.config import BuildParams


@dataclasses.dataclass
class RenderSession:
    params: BuildParams
    grid: UniformGrid

    @staticmethod
    def create(tris: Triangles, params: BuildParams | None = None
               ) -> "RenderSession":
        params = params or BuildParams()
        grid = build_uniform(tris, density=params.snd_density)
        return RenderSession(params=params, grid=grid)

    def rebuild(self, tris: Triangles):
        """Per-frame rebuild. Shapes are stable across calls (same caps), so
        only the first call compiles."""
        self.grid = build_uniform(
            tris, density=self.params.snd_density,
            ref_capacity=self.grid.ref_ids.shape[0], dims=self.grid.dims)
        return self.grid.total_refs  # something to block on

    def trace(self, rays: Rays, any_hit: bool = False) -> Hits:
        return trace_uniform(self.grid, rays, any_hit=any_hit)

    def describe(self) -> str:
        g = self.grid
        return (f"uniform dims={g.dims} cells={g.num_cells} "
                f"refs={int(jax.device_get(g.total_refs))}")
