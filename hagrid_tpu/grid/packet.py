"""Packet grid: slice-major acceleration structure for the Pallas tracer.

The reference's traversal (src/traverse.cu) is one CUDA thread per ray
chasing per-ray gathers; the TPU has no SIMT latency hiding, so per-ray
gathers are the measured wall (docs/ARCHITECTURE.md). The TPU-native
answer is *coherent packet traversal* (in the spirit of Wald et al.'s
coherent grid traversal): a tile of rays marches the grid slice by slice
along its dominant axis, the frustum's cross-section selects a small rect
of cells per slice, and the union of those cells' triangles is tested
densely against the whole tile — every memory access becomes a contiguous
block DMA and every intersection test a dense MXU/VPU op. Divergence is
handled by binning rays by direction (and terminating slices early), not
by per-lane control flow.

This module builds the data structure the kernel consumes:

- cells of a uniform grid laid out **slice-major per major axis** `a`:
  linear index (va * Db + vb) * Dc + vc with (b, c) = ((a+1)%3, (a+2)%3),
  c fastest. A slice-rect row of cells, and therefore its refs, is then a
  contiguous run — one DMA each.
- `starts3_<a>` i32[Da, Db, Dc+1]: per-cell ref-run boundaries, with the
  extra column closing the last run of each row.
- `refq_<a>` f32[12, 4*R]: per-ref Moller-Trumbore *matmul columns*,
  blocked per 128 refs as [t | det | u | v] column groups so ONE MXU
  contraction per 128-ref panel,
      Y = X[:, 0:12] @ refq[:, 4*r : 4*r + 512]      (K = 12)
  yields all four quantities (t_num, det, u_num, v_num) as contiguous
  128-wide slices of Y. X is the per-ray 16-vector
  [1, o, d, m=o x d, 0, 0, tmin, tmax, pad]; K=12 costs the same MXU
  passes as K=8 (one systolic pass covers K<=128). Derivation (scalar
  triple products; validated to 1e-13 against the classic form):
      det   = -d.n              n  = e1 x e2
      t_num =  o.n - c0         c0 = v0.n
      u_num =  m.e2 - d.q1      q1 = e2 x v0
      v_num = -m.e1 - d.q2      q2 = v0 x e1
  and (t, u, v) = (t_num, u_num, v_num) / det — identical to the
  reference's Moller-Trumbore up to f32 reassociation.
- `refid_<a>` f32[1, R]: triangle id bits (bitcast i32) per ref.

Round 2 adds *row-aligned panels* consumed by ops/sweep_trace.py (the
planned-sweep tracer). Each grid row (k, j) of cells gets its refs
chopped into ceil(rc/128) panels of 128 (the last panel of a row is
zero-padded), so a panel never straddles rows or slices and is exactly
addressable by column: the `qc1`/`qc2` tables map (k, j, c) to the
panel of the first ref at column >= c / the last ref at column < c.
The tracer's XLA planning phase turns a frustum rect into contiguous
panel-id RANGES with two gathers per rect row — no per-panel masks, no
device-wide scatters. `reft` holds the classic Moller-Trumbore inputs
(v0, e1, e2, id bits) column-per-ref so the sweep kernel can run
exact-f32 MT on the VPU; all three layouts are concatenated panel-wise
(layout a's panels at [a*P_cap, (a+1)*P_cap)) so one BlockSpec serves
every item.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Triangles
from ..ops.segment import expand_by_counts, segment_starts, sort_pairs
from ..utils.config import density_dims
from .uniform import tri_box_overlap, tri_voxel_ranges

# starts3 padding: the tracer DMAs fixed (8, 16, 256) windows whose
# offsets must be Mosaic-aligned (sublane multiple of 8, lane multiple of
# 128), so each table is edge-padded so that any aligned window anchored
# at a logical coordinate stays in bounds. Padded entries replicate edge
# values (their runs are empty or never read: the kernel clamps its rect
# to the logical dims).
PAD_A = 8


def pad_b(db: int) -> int:
    return max(-(-db // 8) * 8 + 8, 16)


def pad_c1(dc1: int) -> int:
    return max(-(-dc1 // 128) * 128 + 128, 256)

# X-matrix column layout (one row per ray, 16 columns):
#   [0]=1, [1:4]=org, [4:7]=dir, [7:10]=m = org x dir, [10:12]=0,
#   [12]=tmin, [13]=min(tmax, BIG), [14:16]=0.
# The kernel contracts the FULL 16 columns against the (zero-row-padded)
# refq tables; tmax is clamped to the finite BIG because +inf * 0-row
# = NaN would poison the contraction sum.
X_COLS = 16
BIG = 3e38  # finite stand-in for +inf throughout the packet pipeline


@flax.struct.dataclass
class PacketGrid:
    # Per-layout grid dims, PERMUTED to (slice, row, col) order:
    # dims3[a] = (Da, Db, Dc) for major axis a with (b, c) = ((a+1)%3,
    # (a+2)%3). Layouts are independent grids: coarse along their slice
    # axis (few marched slices) and fine in cross-section (tight frustum
    # rects) — the packet analog of the reference's per-cell adaptivity.
    dims3: tuple = flax.struct.field(pytree_node=False)
    bbox_lo: jnp.ndarray  # f32[3]
    bbox_hi: jnp.ndarray  # f32[3]
    # Per major axis a: slice-major tables (see module docstring).
    starts_x: jnp.ndarray  # i32[Dx, Dy, Dz+1]
    starts_y: jnp.ndarray  # i32[Dy, Dz, Dx+1]
    starts_z: jnp.ndarray  # i32[Dz, Dx, Dy+1]
    refq_x: jnp.ndarray    # f32[12, 4*R_cap], 128-ref blocked
    refq_y: jnp.ndarray
    refq_z: jnp.ndarray
    refid_x: jnp.ndarray   # f32[1, R_cap] (i32 id bits)
    refid_y: jnp.ndarray
    refid_z: jnp.ndarray
    # Sweep-tracer tables (all three layouts concatenated panel-wise;
    # P_cap = R_cap // 128 + max_rows panels per layout, 3*P_cap total):
    # reft f32[16, 128*3*P_cap]: classic MT columns per (row-aligned)
    # panel slot — rows 0:3 v0, 3:6 e1, 6:9 e2, row 9 tri-id bits,
    # rows 10:16 zero. Dead slots are all-zero (det = 0, never hit).
    reft: jnp.ndarray
    # qc1/qc2 i32[sum_a Da*Db*(Dc+1)]: flattened per-layout tables of
    # GLOBAL panel ids (layout offset folded in). qc1[k,j,c] = panel of
    # the first ref of row (k,j) at column >= c; qc2[k,j,c] = panel of
    # the last ref at column < c. A rect's panels in row (k,j) are the
    # contiguous range [qc1[k,j,c0], qc2[k,j,c1+1]] (empty if reversed).
    qc1: jnp.ndarray
    qc2: jnp.ndarray
    # Compaction-gather tables (ops/sweep_trace.py round-2b path):
    # rs i32[sum_a Da*Db*(Dc+1)]: like qc1/qc2 but REF-level — absolute
    # row index into `cols` of the first ref of row (k,j) at column
    # >= c (layout offset a*R_cap folded in). cols f32[3*R_cap + 8,
    # 16]: per-ref MT rows [v0(3) e1(3) e2(3) idbits zeros(6)] in
    # sorted order per layout; the trailing 8 zero rows are the DEAD
    # target (det = 0) for padding slots.
    rs: jnp.ndarray
    cols: jnp.ndarray
    total_refs: jnp.ndarray   # i32[]: max SAT-surviving refs per layout
    total_pairs: jnp.ndarray  # i32[]: max pre-SAT (tri, cell) pairs --
    #                           the capacity-bound quantity
    tris: Triangles

    @property
    def ref_capacity(self) -> int:
        return (self.cols.shape[0] - 8) // 3

    @property
    def panels_per_layout(self) -> int:
        """Legacy (march_tables) row-aligned panel count per layout."""
        max_rows = max(d[0] * d[1] for d in self.dims3)
        return self.ref_capacity // 128 + max_rows

    @property
    def overflowed(self):
        """Device bool: per-layout pairs exceeded capacity (only possible
        when built with check=False); hits may then be missed."""
        return self.total_pairs > self.ref_capacity

    @property
    def num_cells(self) -> int:
        return int(np.prod(self.dims3[0]))

    def axis_tables(self, axis: int):
        return ((self.starts_x, self.refq_x, self.refid_x),
                (self.starts_y, self.refq_y, self.refid_y),
                (self.starts_z, self.refq_z, self.refid_z))[axis]


def mt_matmul_columns(tris: Triangles):
    """Per-triangle 4x12 matmul columns (see module docstring). f32[T,4,12].

    Rows contract against X[:, 0:12] = [1, o(3), d(3), m(3), 0, 0]."""
    v0, e1, e2, n = tris.v0, tris.e1, tris.e2, tris.n
    q1 = jnp.cross(e2, v0)
    q2 = jnp.cross(v0, e1)
    c0 = jnp.sum(v0 * n, axis=-1, keepdims=True)
    t = v0.shape[0]
    z1 = jnp.zeros((t, 1), jnp.float32)
    z2 = jnp.zeros((t, 2), jnp.float32)
    z3 = jnp.zeros((t, 3), jnp.float32)
    b_t = jnp.concatenate([-c0, n, z3, z3, z2], axis=1)
    b_det = jnp.concatenate([z1, z3, -n, z3, z2], axis=1)
    b_u = jnp.concatenate([z1, z3, -q1, e2, z2], axis=1)
    b_v = jnp.concatenate([z1, z3, -q2, -e1, z2], axis=1)
    return jnp.stack([b_t, b_det, b_u, b_v], axis=1)      # [T, 4, 12]


def rays_to_x(org, dir, tmin, tmax):
    """Pack rays into the kernel's X matrix. f32[N, 16]."""
    n = org.shape[0]
    one = jnp.ones((n, 1), jnp.float32)
    m = jnp.cross(org, dir)
    z2 = jnp.zeros((n, 2), jnp.float32)
    tmax = jnp.minimum(tmax, BIG)
    return jnp.concatenate(
        [one, org, dir, m, z2, tmin[:, None], tmax[:, None], z2], axis=1)


def _axis_order(axis: int):
    return axis, (axis + 1) % 3, (axis + 2) % 3


@functools.partial(jax.jit, static_argnames=("dims3", "ref_capacity",
                                             "march_tables"))
def _build(tris: Triangles, bbox_lo, bbox_hi, dims3, ref_capacity,
           march_tables=False):
    """Bin tris into each layout's (independent) grid and emit the three
    slice-major tables. march_tables=True additionally emits the legacy
    in-kernel-march tables (starts3/refq/refid for ops/packet_trace.py);
    the default builds only what the sweep tracer needs."""
    bq = mt_matmul_columns(tris) if march_tables else None
    # Shared panel capacity so layout a's panels live at a fixed offset
    # a * p_cap: worst case one padded partial panel per grid row.
    max_rows = max(d[0] * d[1] for d in dims3)
    # One fused per-tri attribute row [v0 e1 e2 idbits 0*6]: the
    # per-layout ref tables then need ONE 64B-row gather each instead
    # of three narrow ones (row gathers are latency-bound: ~35ns/row).
    tri_t = jnp.concatenate(
        [tris.v0, tris.e1, tris.e2,
         jax.lax.bitcast_convert_type(
             jnp.arange(max(tris.count, 1), dtype=jnp.int32),
             jnp.float32)[:, None],
         jnp.zeros((max(tris.count, 1), 6), jnp.float32)], axis=1)

    outs = []
    totals = []
    reals = []
    for axis in range(3):
        a, b, c = _axis_order(axis)
        da, db, dc = dims3[axis]
        dims_xyz = [0, 0, 0]
        dims_xyz[a], dims_xyz[b], dims_xyz[c] = da, db, dc
        lo, hi = tri_voxel_ranges(tris, bbox_lo, bbox_hi, tuple(dims_xyz))
        span = hi - lo + 1
        counts = span[:, 0] * span[:, 1] * span[:, 2]
        tri_idx, rank, valid, total = expand_by_counts(counts,
                                                      ref_capacity)
        # One fused (lo, span) gather per pair (row gathers are
        # latency-bound, so fewer wide rows beat many narrow ones).
        lospan = jnp.concatenate([lo, span, jnp.zeros_like(lo[:, :2])],
                                 axis=1)[tri_idx]
        s = lospan[:, 3:6]
        l = lospan[:, 0:3]
        dx = rank % s[:, 0]
        rem = rank // s[:, 0]
        dy = rem % s[:, 1]
        dz = rem // s[:, 1]
        v = jnp.stack([l[:, 0] + dx, l[:, 1] + dy, l[:, 2] + dz], axis=1)

        num_cells = da * db * dc
        # Exact SAT pruning (reference parity: src/build.cu exact
        # overlap): drop (tri, cell) pairs whose triangle misses the
        # cell box. Cuts refs ~25-40%, which shrinks panels AND the
        # per-panel live lanes the tracer tests.
        csx = jnp.stack([(bbox_hi[0] - bbox_lo[0]) / dims_xyz[0],
                         (bbox_hi[1] - bbox_lo[1]) / dims_xyz[1],
                         (bbox_hi[2] - bbox_lo[2]) / dims_xyz[2]])
        cell_lo = bbox_lo[None, :] + v.astype(jnp.float32) * csx[None, :]
        tvk = tri_t[tri_idx]        # one 64B-row gather: v0|e1|e2
        tv0 = tvk[:, 0:3]
        sat = tri_box_overlap(tv0, tv0 + tvk[:, 3:6],
                              tv0 + tvk[:, 6:9],
                              cell_lo, cell_lo + csx[None, :])
        keep = valid & sat
        key = (v[:, a] * db + v[:, b]) * dc + v[:, c]
        key = jnp.where(keep, key, num_cells)
        skeys, srefs = sort_pairs(key, jnp.where(keep, tri_idx, 0))
        starts = segment_starts(skeys, num_cells)  # i32[C+1]
        live = jnp.arange(ref_capacity) < starts[num_cells]

        # --- Sweep-tracer tables: row-aligned panels + qcol ranges ---
        nrows = da * db
        row_start = starts[::dc]                      # i32[nrows + 1]
        rc = row_start[1:] - row_start[:-1]           # refs per row
        pc = -(-rc // 128)                            # panels per row
        pbase = jnp.cumsum(pc) - pc                   # exclusive scan
        p_cap = ref_capacity // 128 + max_rows
        # qcol: panel id per (row, boundary column).
        s_log = jnp.concatenate(
            [starts[:num_cells].reshape(nrows, dc),
             row_start[1:, None]], axis=1)            # i32[nrows, dc+1]
        rel = s_log - row_start[:-1, None]
        qc1 = (pbase[:, None] + rel // 128 + axis * p_cap).reshape(-1)
        qc2 = (pbase[:, None] + (rel - 1) // 128 + axis * p_cap
               ).reshape(-1)
        rs = (s_log + axis * ref_capacity).reshape(-1)
        # Per-ref classic MT columns: ONE row gather from tri_t.
        colsT = jnp.where(live[:, None], tri_t[srefs], 0.0)
        if march_tables:
            # Legacy row-aligned panel table (ops/packet_trace epoch).
            row_of_p, q, pvalid, _ = expand_by_counts(pc, p_cap)
            base = row_start[:-1][row_of_p] + q * 128  # i32[p_cap]
            idx = base[:, None] + jnp.arange(128,
                                             dtype=jnp.int32)[None, :]
            lane_live = (pvalid[:, None]
                         & (idx < (row_start[:-1]
                                   + rc)[row_of_p][:, None]))
            idxc = jnp.clip(idx, 0, ref_capacity - 1).reshape(-1)
            reft = jnp.where(lane_live.reshape(-1)[:, None],
                             colsT[idxc], 0.0).T       # [16, p_cap*128]
        else:
            reft = jnp.zeros((16, 128), jnp.float32)

        if march_tables:
            s3 = starts[:num_cells].reshape(da, db, dc)
            # Row (k, j) closes at the next row's start (monotonicity).
            end_col = starts[dc::dc].reshape(da, db, 1)
            starts3 = jnp.concatenate([s3, end_col], axis=2)
            starts3 = jnp.pad(
                starts3, ((0, max(PAD_A - da, 0)), (0, pad_b(db) - db),
                          (0, pad_c1(dc + 1) - (dc + 1))), mode="edge")
            # Dead tail rows: all-zero columns -> det = 0 -> no hit.
            refq = jnp.where(live[:, None, None], bq[srefs], 0.0)
            # Block per 128 refs as [t|det|u|v] column groups: one K=12
            # MXU contraction per panel covers all four quantities.
            refq = (refq.reshape(ref_capacity // 128, 128, 4, 12)
                    .transpose(3, 0, 2, 1)      # [12, R/128, 4, 128]
                    .reshape(12, 4 * ref_capacity))
            # Pad to 16 rows (sublane tiling); X cols 12:16 contribute 0.
            refq = jnp.pad(refq, ((0, 4), (0, 0)))
            # (1, R): Mosaic rejects dynamic-offset DMAs on 1-D arrays.
            refid = jax.lax.bitcast_convert_type(
                jnp.where(live, srefs, -1).astype(jnp.int32),
                jnp.float32)[None, :]
        else:
            starts3 = jnp.zeros((PAD_A, pad_b(db), pad_c1(dc + 1)),
                                jnp.int32)
            refq = jnp.zeros((16, 4 * 128), jnp.float32)
            refid = jnp.zeros((1, 128), jnp.float32)
        outs.append((starts3, refq, refid, reft, qc1, qc2, rs, colsT))
        totals.append(total)              # AABB pairs (capacity bound)
        reals.append(starts[num_cells])   # SAT-surviving refs
    reft_all = jnp.concatenate([o[3] for o in outs], axis=1)
    qc1_all = jnp.concatenate([o[4] for o in outs])
    qc2_all = jnp.concatenate([o[5] for o in outs])
    rs_all = jnp.concatenate([o[6] for o in outs])
    cols_all = jnp.concatenate(
        [o[7] for o in outs] + [jnp.zeros((8, 16), jnp.float32)])
    outs = [o[:3] for o in outs]
    return (outs, reft_all, qc1_all, qc2_all, rs_all, cols_all,
            jnp.max(jnp.stack(totals)), jnp.max(jnp.stack(reals)))


def build_packet(tris: Triangles, cross_density: float = 0.4,
                 slice_density: float = 0.02,
                 ref_capacity: int | None = None,
                 dims: tuple | None = None,
                 dims3: tuple | None = None,
                 bbox=None, check: bool = True,
                 march_tables: bool = False) -> PacketGrid:
    """Host wrapper: static dims/capacity from the density heuristic,
    retry on overflow (same capacity policy as the other builders).

    Each layout gets an ANISOTROPIC grid: slice_density sets the (coarse)
    resolution along its march axis — few slices, each a thick slab —
    and cross_density the (fine) cross-section — tight frustum rects.
    `dims` forces one isotropic grid for all three layouts (tests);
    `dims3` forces exact per-layout dims (per-frame rebuilds).

    Device->host reads permanently degrade this environment's dispatch
    path (see docs/ARCHITECTURE.md), so per-frame rebuilds should pass
    `bbox` (host floats) and `check=False` with a capacity sized by the
    first frame; overflow is then detectable via grid.overflowed."""
    if tris.count == 0:
        z3 = jnp.zeros((PAD_A, pad_b(1), pad_c1(2)), jnp.int32)
        zq = jnp.zeros((16, 4 * 256), jnp.float32)
        zi = jnp.zeros((1, 256), jnp.float32)
        p_cap = 256 // 128 + 1
        zt = jnp.zeros((16, 3 * p_cap * 128), jnp.float32)
        # Empty rows: qc2 < qc1 -> every range is empty.
        zq1 = jnp.tile(jnp.arange(3, dtype=jnp.int32)[:, None] * p_cap,
                       (1, 2)).reshape(-1)
        zq2 = zq1 - 1
        d3 = ((1, 1, 1),) * 3
        return PacketGrid(dims3=d3, bbox_lo=jnp.zeros(3, jnp.float32),
                          bbox_hi=jnp.ones(3, jnp.float32),
                          starts_x=z3, starts_y=z3, starts_z=z3,
                          refq_x=zq, refq_y=zq, refq_z=zq,
                          refid_x=zi, refid_y=zi, refid_z=zi,
                          reft=zt, qc1=zq1, qc2=zq2,
                          rs=jnp.zeros((6,), jnp.int32),
                          cols=jnp.zeros((3 * 256 + 8, 16), jnp.float32),
                          total_refs=jnp.int32(0),
                          total_pairs=jnp.int32(0), tris=tris)
    if bbox is not None:
        lo, hi = np.asarray(bbox[0], np.float32), np.asarray(bbox[1],
                                                             np.float32)
    else:
        tlo, thi = jax.device_get(tris.bounds())
        lo = tlo.min(0)
        hi = thi.max(0)
    pad = (hi - lo) * 1e-4 + 1e-4
    lo = lo - pad
    hi = hi + pad
    if dims3 is not None:
        pass
    elif dims is None:
        cross = density_dims(hi - lo, tris.count, cross_density)
        slab = density_dims(hi - lo, tris.count, slice_density)
        dims3 = tuple(
            (slab[a], cross[(a + 1) % 3], cross[(a + 2) % 3])
            for a in range(3))
    else:
        dims3 = tuple(
            (dims[a], dims[(a + 1) % 3], dims[(a + 2) % 3])
            for a in range(3))
    if ref_capacity is None:
        ref_capacity = max(1024, int(tris.count * 2))
    ref_capacity = -(-ref_capacity // 256) * 256
    bbox_lo = jnp.asarray(lo, jnp.float32)
    bbox_hi = jnp.asarray(hi, jnp.float32)
    while True:
        outs, reft, qc1, qc2, rs, cols, pairs, total = _build(
            tris, bbox_lo, bbox_hi, dims3, ref_capacity, march_tables)
        if not check:
            break
        t = int(jax.device_get(pairs))
        if t <= ref_capacity:
            break
        ref_capacity = -(-int(t * 1.25) // 256) * 256
    (sx, qx, ix), (sy, qy, iy), (sz, qz, iz) = outs
    return PacketGrid(dims3=dims3, bbox_lo=bbox_lo, bbox_hi=bbox_hi,
                      starts_x=sx, starts_y=sy, starts_z=sz,
                      refq_x=qx, refq_y=qy, refq_z=qz,
                      refid_x=ix, refid_y=iy, refid_z=iz,
                      reft=reft, qc1=qc1, qc2=qc2, rs=rs, cols=cols,
                      total_refs=total, total_pairs=pairs, tris=tris)
