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
from ..grid import irregular, uniform
from ..utils.config import BuildParams


@dataclasses.dataclass
class RenderSession:
    params: BuildParams
    structure: str  # "irregular" (flagship) or "uniform"
    grid: object

    @staticmethod
    def create(tris: Triangles, params: BuildParams | None = None,
               structure: str = "irregular") -> "RenderSession":
        params = params or BuildParams()
        s = RenderSession(params=params, structure=structure, grid=None)
        s.rebuild(tris)
        return s

    def rebuild(self, tris: Triangles):
        """Per-frame rebuild. Capacity buckets are stable across frames, so
        only the first frame compiles."""
        if self.structure == "uniform":
            kw = {}
            if self.grid is not None:
                kw = dict(ref_capacity=self.grid.ref_ids.shape[0],
                          dims=self.grid.dims)
            self.grid = uniform.build_uniform(
                tris, density=self.params.snd_density, **kw)
        else:
            kw = {}
            if self.grid is not None:
                kw = dict(top_dims=self.grid.top_dims)
            self.grid = irregular.build_irregular(tris, self.params, **kw)
        return self.grid.total_refs  # something to block on

    def trace(self, rays: Rays, any_hit: bool = False) -> Hits:
        if self.structure == "uniform":
            return uniform.trace_uniform_fast(self.grid, rays,
                                              any_hit=any_hit)
        return irregular.trace_irregular_fast(self.grid, rays,
                                              any_hit=any_hit)

    def describe(self) -> str:
        if self.structure == "uniform":
            g = self.grid
            return (f"uniform dims={g.dims} cells={g.num_cells} "
                    f"refs={int(jax.device_get(g.total_refs))}")
        st = self.grid.stats()
        return (f"irregular top={st['top_dims']} levels={st['levels']} "
                f"cells={st['cells']} refs={st['refs']} "
                f"mean_refs={st['refs_per_cell_mean']:.2f} "
                f"empty={st['empty_cell_frac']:.2f}")
