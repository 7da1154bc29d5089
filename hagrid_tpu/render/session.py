"""RenderSession: the engine facade (build + trace under one object).

Counterpart of the reference's main.cpp orchestration: owns the current
acceleration structure, rebuilds it per frame (static capacities — the
TPU replacement for the reference MemManager slot allocator: iteration 2+
is allocation-free because shapes never change), and dispatches traversal
on the best available path. bench.py, the CLI, and __graft_entry__ all go
through this facade so the fastest path is always the one benched.

Structures:
- "packet"    (default): slice-major packet grid + planned-sweep Pallas
              tracer (ops/sweep_trace.py) — the flagship TPU path.
- "irregular": two-level irregular grid (reference parity structure)
              + wavefront gather tracer.
- "uniform":  single-level grid, the BASELINE config #1 reference path.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..core.types import Hits, Rays, Triangles
from ..grid import irregular, packet, uniform
from ..ops.sweep_trace import trace_sweep
from ..utils.config import BuildParams


@dataclasses.dataclass
class RenderSession:
    params: BuildParams
    structure: str  # "packet" (flagship) | "irregular" | "uniform"
    grid: object
    bbox: tuple | None = None  # host-side scene bounds (packet rebuilds)
    # Device scalar: OR of the sweep tracer's block-budget overflow
    # flags since session start. Never read on the hot path; bench
    # checks it once at the end (D2H reads are deferred by design).
    trace_overflow: object = None
    # Demand-calibrated sweep block budgets per wave shape. The items
    # stage costs O(budget) whether blocks are live or not (measured
    # ~0.7 us per 1k budget blocks), so the first trace of each wave
    # shape runs with the generous default budget, reads the true peak
    # demand once (one host sync, outside any timed frame), and later
    # frames run with demand * margin. The overflow flag still reports
    # any frame whose demand outgrows the calibrated budget.
    _bmax_cal: dict = dataclasses.field(default_factory=dict)

    @staticmethod
    def create(tris: Triangles, params: BuildParams | None = None,
               structure: str = "packet",
               verts=None, bbox_margin: float = 0.0) -> "RenderSession":
        """verts: optional host vertex array; lets the packet build skip
        the device->host bounds read (which permanently degrades this
        environment's dispatch latency — docs/ARCHITECTURE.md).

        bbox_margin: fraction of the scene extent added on every side of
        the session bbox. Warm packet rebuilds reuse this frame-1 bbox
        without a device read, so animated geometry that deforms OUTSIDE
        it is clamped into boundary cells and hits can be silently
        missed; callers animating geometry must pass a margin covering
        the expected motion (bench's wave deform uses 0.3)."""
        params = params or BuildParams()
        s = RenderSession(params=params, structure=structure, grid=None)
        if verts is not None and len(verts):
            v = np.asarray(verts, np.float32)
            lo, hi = v.min(0), v.max(0)
            pad = (hi - lo) * np.float32(bbox_margin)
            s.bbox = (lo - pad, hi + pad)
        s.rebuild(tris)
        return s

    def rebuild(self, tris: Triangles):
        """Per-frame rebuild. Capacity buckets are stable across frames,
        so only the first frame compiles, and (packet path) frames after
        the first run with zero host synchronisation."""
        if self.structure == "uniform":
            kw = {}
            if self.grid is not None:
                kw = dict(ref_capacity=self.grid.ref_ids.shape[0],
                          dims=self.grid.dims)
            self.grid = uniform.build_uniform(
                tris, density=self.params.snd_density, **kw)
        elif self.structure == "irregular":
            kw = {}
            if self.grid is not None:
                kw = dict(top_dims=self.grid.top_dims)
            self.grid = irregular.build_irregular(tris, self.params,
                                                  **kw)
        else:
            kw = dict(bbox=self.bbox)
            if self.grid is not None:
                # Sync-free warm rebuild: frame-1 capacity, deferred
                # overflow detection via grid.overflowed.
                kw.update(ref_capacity=self.grid.ref_capacity,
                          dims3=self.grid.dims3, check=False)
            self.grid = packet.build_packet(tris, **kw)
            if self.bbox is None:
                self.bbox = (np.asarray(self.grid.bbox_lo),
                             np.asarray(self.grid.bbox_hi))
        return self.grid.total_refs  # something to block on

    def trace(self, rays: Rays, any_hit: bool = False,
              coherent: bool = False, cal_key=None) -> Hits:
        """coherent=True: rays are already direction-coherent in order
        (camera primaries) — the packet path then skips its binning
        permutation. Ignored by the other structures.

        cal_key: extra identity for the demand calibration. Different
        wave KINDS have very different block demands (a primary frame
        vs the 3rd path bounce), so callers issuing several waves of
        the same shape per frame must distinguish them — sharing one
        calibrated budget across AO samples / path bounces was exactly
        what overflowed round 3's AO and path numbers (the budget was
        calibrated on whichever wave ran first)."""
        if self.structure == "uniform":
            return uniform.trace_uniform_fast(self.grid, rays,
                                              any_hit=any_hit)
        if self.structure == "irregular":
            return irregular.trace_irregular_fast(self.grid, rays,
                                                  any_hit=any_hit)
        key = (any_hit, coherent, rays.count, cal_key)
        cal = self._bmax_cal.get(key)
        if cal is None:
            _, _, demand = trace_sweep(
                self.grid, rays, any_hit=any_hit, coherent=coherent,
                return_overflow=True, return_demand=True)
            # Incoherent waves (AO/path bounces) vary frame to frame;
            # give them more slack than fixed-camera primaries.
            margin = 1.3 if (coherent and not any_hit) else 1.5
            dm = jax.device_get(demand)
            d, rows = int(dm[0]), int(dm[1])
            # Quantize to 1024-block steps: distinct wave kinds with
            # similar demand then share one compiled frame (budgets are
            # static shapes; a fresh compile per cal_key would cost
            # ~30s each on this backend). Incoherent waves get a much
            # higher ceiling: their true demand is what round 3's
            # fixed 24.6k cap silently dropped (AO occ 0.023 vs true
            # 0.194); the compact planner makes big budgets cheap
            # (items cost scales with live rows, not slot space), and
            # the measured sorted Sponza AO demand is 59.4k blocks at
            # tile=256.
            cap = 24576 if coherent else 131072
            bmax = min(
                cap, max(1024, -(-int(d * margin) // 1024) * 1024))
            # Row-stream capacity (compact planner; rows==0 on dense).
            rowmax = (max(8192, -(-int(rows * margin) // 8192) * 8192)
                      if rows else None)
            cal = (bmax, rowmax)
            self._bmax_cal[key] = cal
            # Fall through to a calibrated-budget trace: the budget is
            # a static shape, so the calibrated variant compiles HERE
            # (one-time, off any timed frame) — returning the generous
            # -budget hits instead would defer that compile into the
            # caller's first steady-state frame (measured as a 21 s
            # stall in the middle of the dynamic benchmark).
        bmax, rowmax = cal
        hits, ovf = trace_sweep(self.grid, rays, any_hit=any_hit,
                                coherent=coherent, bmax=bmax,
                                rowmax=rowmax, return_overflow=True)
        self.trace_overflow = ovf if self.trace_overflow is None \
            else self.trace_overflow | ovf
        return hits

    def describe(self) -> str:
        if self.structure == "uniform":
            g = self.grid
            return (f"uniform dims={g.dims} cells={g.num_cells} "
                    f"refs={int(jax.device_get(g.total_refs))}")
        if self.structure == "irregular":
            st = self.grid.stats()
            return (f"irregular top={st['top_dims']} "
                    f"levels={st['levels']} "
                    f"cells={st['cells']} refs={st['refs']} "
                    f"mean_refs={st['refs_per_cell_mean']:.2f} "
                    f"empty={st['empty_cell_frac']:.2f}")
        g = self.grid
        # No device reads here: describe() runs before trace timing.
        return (f"packet dims3={g.dims3} ref_capacity={g.ref_capacity}")
