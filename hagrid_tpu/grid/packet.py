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
- `refq_<a>` f32[4, 8, R]: per-ref Moller-Trumbore *matmul columns*. The
  kernel computes, for a whole ray tile at once,
      Y_q = X_window @ refq[q]           (MXU, K = 8)
  where X is a per-ray 16-vector [1, o, d, m=o x d, tmin, tmax, pad] and
  the four quantities (t_num, det, u_num, v_num) come out as dense
  (rays, refs) panels. Derivation (scalar triple products; validated to
  1e-13 against the classic form):
      det   = -d.n              n  = e1 x e2
      t_num =  o.n - c0         c0 = v0.n
      u_num =  m.e2 - d.q1      q1 = e2 x v0
      v_num = -m.e1 - d.q2      q2 = v0 x e1
  and (t, u, v) = (t_num, u_num, v_num) / det — identical to the
  reference's Moller-Trumbore up to f32 reassociation.
- `refid_<a>` f32[R]: triangle id bits (bitcast i32) per ref.
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
from .uniform import tri_voxel_ranges

# Minimum starts3 extents: the tracer DMAs fixed-size (PAD_A, PAD_B,
# PAD_C1) windows, so tables are edge-padded up to these. Padded rows
# replicate edge values (runs there are empty or never read: the kernel
# clamps its rect to the logical dims).
PAD_A, PAD_B, PAD_C1 = 8, 8, 25

# X-matrix column layout (one row per ray, 16 columns):
#   [0]=1, [1:4]=org, [4:7]=dir, [7:10]=m = org x dir, [10:12]=0,
#   [12]=tmin, [13]=tmax.
# The kernel contracts 8-column windows of X against the refq tables:
#   t   uses X[:, 0:8]  = [1, o, d_x..d_z, (m_x -> 0 row)]
#   det/u/v use X[:, 4:12] = [d, m, (pad -> 0 rows)]
# tmin/tmax live OUTSIDE both windows: tmax is +inf for camera rays and
# inf * 0-row = NaN would poison the contraction.
X_COLS = 16


@flax.struct.dataclass
class PacketGrid:
    dims: tuple = flax.struct.field(pytree_node=False)  # (Dx, Dy, Dz)
    bbox_lo: jnp.ndarray  # f32[3]
    bbox_hi: jnp.ndarray  # f32[3]
    # Per major axis a: slice-major tables (see module docstring).
    starts_x: jnp.ndarray  # i32[Dx, Dy, Dz+1]
    starts_y: jnp.ndarray  # i32[Dy, Dz, Dx+1]
    starts_z: jnp.ndarray  # i32[Dz, Dx, Dy+1]
    refq_x: jnp.ndarray    # f32[4, 8, R_cap]
    refq_y: jnp.ndarray
    refq_z: jnp.ndarray
    refid_x: jnp.ndarray   # f32[R_cap] (i32 id bits)
    refid_y: jnp.ndarray
    refid_z: jnp.ndarray
    total_refs: jnp.ndarray  # i32[]
    tris: Triangles

    @property
    def num_cells(self) -> int:
        return int(np.prod(self.dims))

    def axis_tables(self, axis: int):
        return ((self.starts_x, self.refq_x, self.refid_x),
                (self.starts_y, self.refq_y, self.refid_y),
                (self.starts_z, self.refq_z, self.refid_z))[axis]


def mt_matmul_columns(tris: Triangles):
    """Per-triangle 4x8 matmul columns (see module docstring). f32[T,4,8]."""
    v0, e1, e2, n = tris.v0, tris.e1, tris.e2, tris.n
    q1 = jnp.cross(e2, v0)
    q2 = jnp.cross(v0, e1)
    c0 = jnp.sum(v0 * n, axis=-1, keepdims=True)
    t = v0.shape[0]
    z1 = jnp.zeros((t, 1), jnp.float32)
    z2 = jnp.zeros((t, 2), jnp.float32)
    z3 = jnp.zeros((t, 3), jnp.float32)
    # Rows of each table match the X window it contracts against.
    b_t = jnp.concatenate([-c0, n, z3, z1], axis=1)       # X[:, 0:8]
    b_det = jnp.concatenate([-n, z3, z2], axis=1)         # X[:, 4:12]
    b_u = jnp.concatenate([-q1, e2, z2], axis=1)
    b_v = jnp.concatenate([-q2, -e1, z2], axis=1)
    return jnp.stack([b_t, b_det, b_u, b_v], axis=1)      # [T, 4, 8]


def rays_to_x(org, dir, tmin, tmax):
    """Pack rays into the kernel's X matrix. f32[N, 16]."""
    n = org.shape[0]
    one = jnp.ones((n, 1), jnp.float32)
    m = jnp.cross(org, dir)
    z2 = jnp.zeros((n, 2), jnp.float32)
    return jnp.concatenate(
        [one, org, dir, m, z2, tmin[:, None], tmax[:, None], z2], axis=1)


def _axis_order(axis: int):
    return axis, (axis + 1) % 3, (axis + 2) % 3


@functools.partial(jax.jit, static_argnames=("dims", "ref_capacity"))
def _build(tris: Triangles, bbox_lo, bbox_hi, dims, ref_capacity):
    """Bin tris once, then emit the three slice-major layouts."""
    lo, hi = tri_voxel_ranges(tris, bbox_lo, bbox_hi, dims)
    span = hi - lo + 1
    counts = span[:, 0] * span[:, 1] * span[:, 2]
    tri_idx, rank, valid, total = expand_by_counts(counts, ref_capacity)
    s = span[tri_idx]
    l = lo[tri_idx]
    dx = rank % s[:, 0]
    rem = rank // s[:, 0]
    dy = rem % s[:, 1]
    dz = rem // s[:, 1]
    v = jnp.stack([l[:, 0] + dx, l[:, 1] + dy, l[:, 2] + dz], axis=1)

    num_cells = int(np.prod(dims))
    bq = mt_matmul_columns(tris)  # [T, 4, 8]

    outs = []
    for axis in range(3):
        a, b, c = _axis_order(axis)
        da, db, dc = dims[a], dims[b], dims[c]
        key = (v[:, a] * db + v[:, b]) * dc + v[:, c]
        key = jnp.where(valid, key, num_cells)
        skeys, srefs = sort_pairs(key, jnp.where(valid, tri_idx, 0))
        starts = segment_starts(skeys, num_cells)  # i32[C+1]
        s3 = starts[:num_cells].reshape(da, db, dc)
        # Row (k, j) closes at the next row's start (global monotonicity).
        end_col = starts[dc::dc].reshape(da, db, 1)
        starts3 = jnp.concatenate([s3, end_col], axis=2)
        starts3 = jnp.pad(
            starts3, ((0, max(PAD_A - da, 0)), (0, max(PAD_B - db, 0)),
                      (0, max(PAD_C1 - (dc + 1), 0))), mode="edge")
        live = jnp.arange(ref_capacity) < total
        # Dead tail rows: all-zero columns give det = 0 -> never a hit.
        refq = jnp.where(live[:, None, None], bq[srefs], 0.0)
        refq = refq.transpose(1, 2, 0)  # [4, 8, R]
        refid = jax.lax.bitcast_convert_type(
            jnp.where(live, srefs, -1).astype(jnp.int32), jnp.float32)
        outs.append((starts3, refq, refid))
    return outs, total


def build_packet(tris: Triangles, density: float = 1.2,
                 ref_capacity: int | None = None,
                 dims: tuple | None = None) -> PacketGrid:
    """Host wrapper: static dims/capacity from the density heuristic,
    retry on overflow (same capacity policy as the other builders)."""
    if tris.count == 0:
        z3 = jnp.zeros((PAD_A, PAD_B, PAD_C1), jnp.int32)
        zq = jnp.zeros((4, 8, 256), jnp.float32)
        zi = jnp.zeros((256,), jnp.float32)
        return PacketGrid(dims=(1, 1, 1), bbox_lo=jnp.zeros(3, jnp.float32),
                          bbox_hi=jnp.ones(3, jnp.float32),
                          starts_x=z3, starts_y=z3, starts_z=z3,
                          refq_x=zq, refq_y=zq, refq_z=zq,
                          refid_x=zi, refid_y=zi, refid_z=zi,
                          total_refs=jnp.int32(0), tris=tris)
    tlo, thi = jax.device_get(tris.bounds())
    lo = tlo.min(0)
    hi = thi.max(0)
    pad = (hi - lo) * 1e-4 + 1e-4
    lo = lo - pad
    hi = hi + pad
    if dims is None:
        dims = density_dims(hi - lo, tris.count, density)
    if ref_capacity is None:
        ref_capacity = max(1024, int(tris.count * 4))
    ref_capacity = -(-ref_capacity // 256) * 256
    bbox_lo = jnp.asarray(lo, jnp.float32)
    bbox_hi = jnp.asarray(hi, jnp.float32)
    while True:
        outs, total = _build(tris, bbox_lo, bbox_hi, dims, ref_capacity)
        t = int(jax.device_get(total))
        if t <= ref_capacity:
            break
        ref_capacity = -(-int(t * 1.25) // 256) * 256
    (sx, qx, ix), (sy, qy, iy), (sz, qz, iz) = outs
    return PacketGrid(dims=dims, bbox_lo=bbox_lo, bbox_hi=bbox_hi,
                      starts_x=sx, starts_y=sy, starts_z=sz,
                      refq_x=qx, refq_y=qy, refq_z=qz,
                      refid_x=ix, refid_y=iy, refid_z=iz,
                      total_refs=total, tris=tris)
