"""Structural invariant checks over built grids (host-side, for tests).

The reference validates by golden images only; we additionally assert the
invariants that make traversal correct (SURVEY.md §4.2): conservative
completeness (every tri overlapping a cell is in that cell's ref list),
monotone segment bounds, in-range ref ids.
"""

from __future__ import annotations

import numpy as np

from .uniform import UniformGrid, tri_voxel_ranges


def check_uniform(grid: UniformGrid) -> None:
    starts = np.asarray(grid.cell_starts)
    refs = np.asarray(grid.ref_ids)
    total = int(grid.total_refs)
    n_tris = grid.tris.count
    assert total <= refs.shape[0], "ref buffer overflow"
    assert starts[0] == 0 and starts[-1] == total
    assert np.all(np.diff(starts) >= 0), "cell_starts not monotone"
    assert np.all(refs[:total] >= 0) and np.all(refs[:total] < n_tris)
    assert np.all(refs[total:] == -1)

    # Conservative completeness: recompute each tri's voxel range and check
    # membership in every overlapped cell's segment.
    lo, hi = (np.asarray(x) for x in tri_voxel_ranges(
        grid.tris, grid.bbox_lo, grid.bbox_hi, grid.dims))
    dx, dy, _ = grid.dims
    cell_sets = {}
    for c in range(grid.num_cells):
        seg = refs[starts[c]:starts[c + 1]]
        cell_sets[c] = set(seg.tolist())
        assert np.all(np.diff(seg) > 0) or len(seg) <= 1, \
            f"cell {c} refs not sorted/unique"
    for t in range(n_tris):
        for z in range(lo[t, 2], hi[t, 2] + 1):
            for y in range(lo[t, 1], hi[t, 1] + 1):
                for x in range(lo[t, 0], hi[t, 0] + 1):
                    c = (z * dy + y) * dx + x
                    assert t in cell_sets[c], \
                        f"tri {t} missing from cell {c}"
