"""Planned-sweep packet traversal — flagship TPU tracer, round 2.

Counterpart of the reference's traverse_grid hot loop (src/traverse.cu).
Round 1's lesson: anything scalar inside a Mosaic kernel (per-slice rect
math, window bookkeeping, dynamic VMEM scalar reads) runs at ~1 op/cycle
and dominates; the dense panel tests themselves are cheap. So this
design hoists ALL control flow out of the kernel:

1. **XLA planning (vectorized over ray tiles).** Rays are binned into
   TILE-sized packets by (major axis, sign), Morton/image coherent. Per
   round, each live tile advances one SLAB of S slices along its major
   axis; the tile's frustum rect per slice (pure interval arithmetic on
   8 per-tile scalars) is intersected against the build-time *panel
   directory* (grid/packet.py: bounding cell ranges of each 128-ref
   panel). The result is a compacted, tile-major item list
   (tile_id, panel_id) — dense boolean ops and one cumsum, no gathers.

2. **Pallas sweep kernel (zero scalar control).** grid = (n_items,);
   scalar-prefetched item arrays drive the BlockSpec index maps, so the
   pipeline DMAs each tile's rays (revisits are free) and each panel's
   16x128 triangle block (double-buffered automatically). The body is
   one dense exact-f32 Moller-Trumbore of TILE rays x 128 tris on the
   VPU plus lane-accumulator updates; per-tile results flush when the
   item stream moves to the next tile.

3. **Host round loop.** Per-ray best hits merge after each slab; rays
   terminate when their best hit precedes the next slab's entry plane
   (the standard grid early-out), shrinking both the live-tile set and
   (through t_cap) the frustum rects of the tiles that remain.

Numerics: the VPU path is plain f32 — exact parity with the oracle,
unlike bf16 MXU passes (round 1 measured ~1% flipped hits at DEFAULT
precision and 2x the panel cost at HIGH vs this VPU form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Hits, Rays
from ..grid.packet import PacketGrid, rays_to_x
from .segment import expand_by_counts

_BIG = 3e38
_BIGID = 2 ** 30


# ----------------------------------------------------------------------
# Kernel
# ----------------------------------------------------------------------

def _make_kernel(tile: int):
    def kernel(tile_of, panel_of, x_ref, reft_ref, out_ref,
               acc_t, acc_id, acc_u, acc_v):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        # First/last item of this tile's run, derived from neighbors
        # (prefetched arrays live in 1M SMEM — every extra array counts).
        t_cur = tile_of[i]
        first = (i == 0) | (t_cur != tile_of[jnp.maximum(i - 1, 0)])
        last = (i == n - 1) | (t_cur != tile_of[jnp.minimum(i + 1, n - 1)])

        @pl.when(first)
        def _():
            acc_t[:] = jnp.full((tile, 128), _BIG, jnp.float32)
            acc_id[:] = jnp.full((tile, 128), -1.0, jnp.float32)
            acc_u[:] = jnp.zeros((tile, 128), jnp.float32)
            acc_v[:] = jnp.zeros((tile, 128), jnp.float32)

        # Dense Moller-Trumbore: rays down the sublanes, tris across the
        # lanes. All operands broadcast from (tile, 1) x (1, 128).
        ox = x_ref[:, 1:2]
        oy = x_ref[:, 2:3]
        oz = x_ref[:, 3:4]
        dx = x_ref[:, 4:5]
        dy = x_ref[:, 5:6]
        dz = x_ref[:, 6:7]
        tmin = x_ref[:, 12:13]
        tmax = x_ref[:, 13:14]

        v0x = reft_ref[0:1, :]
        v0y = reft_ref[1:2, :]
        v0z = reft_ref[2:3, :]
        e1x = reft_ref[3:4, :]
        e1y = reft_ref[4:5, :]
        e1z = reft_ref[5:6, :]
        e2x = reft_ref[6:7, :]
        e2y = reft_ref[7:8, :]
        e2z = reft_ref[8:9, :]
        ids = reft_ref[9:10, :]

        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        uu = tvx * pvx + tvy * pvy + tvz * pvz
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        vv = dx * qvx + dy * qvy + dz * qvz
        tt = e2x * qvx + e2y * qvy + e2z * qvz
        inv = 1.0 / det          # det = 0 -> inf/NaN, self-filtered
        t = tt * inv
        u = uu * inv
        v = vv * inv
        # min-form barycentric test; NaN/inf compare false. The eps
        # guard keeps near-parallel slivers from phantom far hits.
        edge = jnp.minimum(jnp.minimum(u, v), 1.0 - (u + v))
        ok = ((edge >= 0.0) & (jnp.abs(det) > 1e-12)
              & (t > tmin) & (t < tmax))
        better = ok & (t < acc_t[:])
        acc_t[:] = jnp.where(better, t, acc_t[:])
        acc_id[:] = jnp.where(better,
                              jnp.broadcast_to(ids, (tile, 128)),
                              acc_id[:])
        acc_u[:] = jnp.where(better, u, acc_u[:])
        acc_v[:] = jnp.where(better, v, acc_v[:])

        @pl.when(last)
        def _():
            bt = jnp.min(acc_t[:], axis=1)
            at_min = acc_t[:] == bt[:, None]
            idi = jax.lax.bitcast_convert_type(acc_id[:], jnp.int32)
            id_min = jnp.min(jnp.where(at_min & (idi >= 0), idi, _BIGID),
                             axis=1)
            sel = at_min & (idi == id_min[:, None])
            u_best = jnp.max(jnp.where(sel, acc_u[:], -_BIG), axis=1)
            v_best = jnp.max(jnp.where(sel, acc_v[:], -_BIG), axis=1)
            found = (bt < _BIG) & (id_min < _BIGID)
            out_ref[:, 0] = jnp.where(found, bt, _BIG)
            out_ref[:, 1] = jax.lax.bitcast_convert_type(
                jnp.where(found, id_min, -1), jnp.float32)
            out_ref[:, 2] = jnp.where(found, u_best, 0.0)
            out_ref[:, 3] = jnp.where(found, v_best, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _sweep(xp_ext, reft, tile_of, panel_of, tile, interpret):
    """Run the item sweep. xp_ext f32[(nt+1)*tile, 16] (last tile dead);
    item arrays i32[n_items]. Returns f32[(nt+1)*tile, 8]; only tiles
    that appear in the item stream carry defined rows."""
    n_rows = xp_ext.shape[0]
    n_items = tile_of.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_items,),
        in_specs=[
            pl.BlockSpec((tile, 16), lambda i, t, p: (t[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda i, t, p: (0, p[i]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 8), lambda i, t, p: (t[i], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_kernel(tile),
        out_shape=jax.ShapeDtypeStruct((n_rows, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_of, panel_of, xp_ext, reft)


# ----------------------------------------------------------------------
# Binning and per-tile precompute (all XLA)
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_pad", "tile"))
def _bin_rays(x, n_pad, tile):
    """Group rays by (major axis, sign) into tile-aligned segments via
    masked cumsums (counting sort; no device-wide lax.sort)."""
    n = x.shape[0]
    d = x[:, 4:7]
    ad = jnp.abs(d)
    axis = jnp.where(ad[:, 0] >= jnp.maximum(ad[:, 1], ad[:, 2]), 0,
                     jnp.where(ad[:, 1] >= ad[:, 2], 1, 2))
    sign = (jnp.take_along_axis(d, axis[:, None], axis=1)[:, 0]
            < 0).astype(jnp.int32)
    g = axis * 2 + sign

    ranks = jnp.zeros((n,), jnp.int32)
    counts = []
    for k in range(6):
        mk = (g == k).astype(jnp.int32)
        ck = jnp.cumsum(mk)
        ranks = jnp.where(g == k, ck - 1, ranks)
        counts.append(ck[-1])
    counts = jnp.stack(counts)
    padded = -(-counts // tile) * tile
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    pos = offs[g] + ranks

    # Padding rows: a dead ray far outside the scene, +x, tmax = 0.
    dead = jnp.zeros((16,), jnp.float32)
    dead = dead.at[0].set(1.0).at[1].set(-1e30).at[4].set(1.0)
    xp = jnp.broadcast_to(dead, (n_pad, 16)).at[pos].set(x, mode="drop")
    inv = jnp.full((n_pad,), -1, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return xp, inv


def _tile_tabs(grid: PacketGrid):
    """Per-layout (cs, dims) tables in (slice, row, col) order."""
    ext = grid.bbox_hi - grid.bbox_lo
    cs_rows, n_rows, lo_rows = [], [], []
    for a in range(3):
        da, db, dc = grid.dims3[a]
        b, c = (a + 1) % 3, (a + 2) % 3
        cs_rows.append(jnp.stack([ext[a] / da, ext[b] / db, ext[c] / dc]))
        n_rows.append(jnp.array([da, db, dc], jnp.int32))
        lo_rows.append(jnp.stack([grid.bbox_lo[a], grid.bbox_lo[b],
                                  grid.bbox_lo[c]]))
    return (jnp.stack(cs_rows), jnp.stack(n_rows), jnp.stack(lo_rows))


@functools.partial(jax.jit, static_argnames=("tile",))
def _precompute(xp, cs_tab, n_tab, lo_tab, bbox_lo, bbox_hi, tile):
    """Static per-ray / per-tile quantities for the round loop."""
    nt = xp.shape[0] // tile
    x3 = xp.reshape(nt, tile, 16)
    o = x3[..., 1:4]
    d = x3[..., 4:7]
    tmin = x3[..., 12]
    tmax = x3[..., 13]

    # Tile-uniform axis/sign from ray 0 (tiles are pure by binning).
    ad0 = jnp.abs(x3[:, 0, 4:7])
    axis = jnp.where(ad0[:, 0] >= jnp.maximum(ad0[:, 1], ad0[:, 2]), 0,
                     jnp.where(ad0[:, 1] >= ad0[:, 2], 1, 2))
    d0 = jnp.take_along_axis(x3[:, 0, 4:7], axis[:, None], 1)[:, 0]
    step = jnp.where(d0 < 0, -1, 1).astype(jnp.int32)

    def perm(arr, ax):  # (nt, tile, 3) -> (nt, tile) at per-tile axis
        return jnp.take_along_axis(arr, ax[:, None, None], 2)[..., 0]

    a1 = (axis + 1) % 3
    a2 = (axis + 2) % 3
    o_a, o_b, o_c = perm(o, axis), perm(o, a1), perm(o, a2)
    d_a, d_b, d_c = perm(d, axis), perm(d, a1), perm(d, a2)

    def inv(dv):
        nz = jnp.abs(dv) > 1e-30
        return jnp.where(nz, 1.0 / jnp.where(nz, dv, 1.0),
                         jnp.where(dv < 0, -_BIG, _BIG))

    inv_a = inv(d_a)

    # Scene slab test (bbox identical across layouts).
    def slab1(oc, dc_, lo, hi):
        i = inv(dc_)
        t0 = (lo - oc) * i
        t1 = (hi - oc) * i
        bad = jnp.isnan(t0 * t1)
        return (jnp.where(bad, -_BIG, jnp.minimum(t0, t1)),
                jnp.where(bad, _BIG, jnp.maximum(t0, t1)))

    nx, fx = slab1(o[..., 0], d[..., 0], bbox_lo[0], bbox_hi[0])
    ny, fy = slab1(o[..., 1], d[..., 1], bbox_lo[1], bbox_hi[1])
    nz_, fz = slab1(o[..., 2], d[..., 2], bbox_lo[2], bbox_hi[2])
    enter = jnp.maximum(jnp.maximum(nx, ny), jnp.maximum(nz_, tmin))
    leave = jnp.minimum(jnp.minimum(fx, fy), jnp.minimum(fz, tmax))
    alive = enter <= leave

    # Per-tile grid constants.
    cs_a = cs_tab[axis, 0]
    lo_a = lo_tab[axis, 0]
    n_a = n_tab[axis, 0]

    # Entry slice from the packet's entry points.
    pa_in = o_a + enter * d_a
    pa_sel = jnp.where(alive, pa_in, jnp.where(step[:, None] > 0,
                                               _BIG, -_BIG))
    front = jnp.where(step > 0, jnp.min(pa_sel, axis=1),
                      jnp.max(pa_sel, axis=1))
    k0 = jnp.clip(jnp.floor((front - lo_a) / cs_a).astype(jnp.int32),
                  0, n_a - 1)

    per_ray = dict(o_a=o_a, o_b=o_b, o_c=o_c, d_a=d_a, d_b=d_b, d_c=d_c,
                   inv_a=inv_a, enter=enter, leave=leave, alive=alive,
                   tmax=tmax)
    per_tile = dict(axis=axis, step=step, k0=k0)
    return per_ray, per_tile


# ----------------------------------------------------------------------
# Round planning (all XLA)
# ----------------------------------------------------------------------

_RMAX = 8  # c-trimmed row ranges per (tile, slice); taller rects fall
#            back to one untrimmed multi-row tail range (conservative).


@functools.partial(jax.jit, static_argnames=("dims3", "slab", "any_hit"))
def _plan(per_ray, per_tile, cs_tab, n_tab, lo_tab, qc1, qc2, ka,
          best_t, dims3, slab, any_hit):
    """One slab's plan: per-tile frustum rect per slice, turned into
    contiguous panel-id ranges via the qcol tables (2 gathers per rect
    row). Returns (range_start, range_count [nt*slab*(RMAX+1)],
    n_items, any_live)."""
    axis = per_tile["axis"]
    step = per_tile["step"]
    cs_a = cs_tab[axis, 0]
    cs_b = cs_tab[axis, 1]
    cs_c = cs_tab[axis, 2]
    lo_a = lo_tab[axis, 0]
    lo_b = lo_tab[axis, 1]
    lo_c = lo_tab[axis, 2]
    n_a = n_tab[axis, 0]
    n_b = n_tab[axis, 1]
    n_c = n_tab[axis, 2]

    # Ray liveness: best hit precedes the slab's entry plane -> done.
    plane0 = lo_a + (ka + (step < 0)).astype(jnp.float32) * cs_a
    t_entry = (plane0[:, None] - per_ray["o_a"]) * per_ray["inv_a"]
    lim = jnp.minimum(per_ray["tmax"], per_ray["leave"])
    if any_hit:
        done = best_t < jnp.minimum(per_ray["tmax"], _BIG)
    else:
        done = best_t <= t_entry
    live = per_ray["alive"] & ~done & (t_entry < lim) \
        & (ka[:, None] >= 0) & (ka[:, None] < n_a[:, None])

    def mn(v):
        return jnp.min(jnp.where(live, v, _BIG), axis=1)

    def mx(v):
        return jnp.max(jnp.where(live, v, -_BIG), axis=1)

    ob_lo, ob_hi = mn(per_ray["o_b"]), mx(per_ray["o_b"])
    oc_lo, oc_hi = mn(per_ray["o_c"]), mx(per_ray["o_c"])
    db_lo, db_hi = mn(per_ray["d_b"]), mx(per_ray["d_b"])
    dc_lo, dc_hi = mn(per_ray["d_c"]), mx(per_ray["d_c"])
    oa_lo, oa_hi = mn(per_ray["o_a"]), mx(per_ray["o_a"])
    ia_lo, ia_hi = mn(per_ray["inv_a"]), mx(per_ray["inv_a"])
    t_lo0 = jnp.maximum(mn(per_ray["enter"]), 0.0)
    t_cap = mx(jnp.minimum(jnp.minimum(best_t, per_ray["tmax"]),
                           per_ray["leave"]))
    live_tile = jnp.any(live, axis=1)

    # Slab slices: (nt, S).
    ks = ka[:, None] + step[:, None] * jnp.arange(slab, dtype=jnp.int32)
    k_ok = (ks >= 0) & (ks < n_a[:, None]) & live_tile[:, None]

    kf = ks.astype(jnp.float32)
    pl0 = lo_a[:, None] + kf * cs_a[:, None]
    pl1 = pl0 + cs_a[:, None]
    cands = []
    for p in (pl0, pl1):
        for oe in (oa_lo, oa_hi):
            for ie in (ia_lo, ia_hi):
                cands.append((p - oe[:, None]) * ie[:, None])
    tl = functools.reduce(jnp.minimum, cands)
    th = functools.reduce(jnp.maximum, cands)
    tl = jnp.maximum(tl, t_lo0[:, None])
    th = jnp.minimum(th, t_cap[:, None])
    t_ok = tl <= th

    def minor(olo, ohi, dlo, dhi, lo_m, cs_m):
        x00 = tl * dlo[:, None]
        x01 = tl * dhi[:, None]
        x10 = th * dlo[:, None]
        x11 = th * dhi[:, None]
        vlo = olo[:, None] + jnp.minimum(jnp.minimum(x00, x01),
                                         jnp.minimum(x10, x11))
        vhi = ohi[:, None] + jnp.maximum(jnp.maximum(x00, x01),
                                         jnp.maximum(x10, x11))
        ics = (1.0 / cs_m)[:, None]
        return (((vlo - lo_m[:, None]) * ics).astype(jnp.int32),
                ((vhi - lo_m[:, None]) * ics).astype(jnp.int32))

    b0, b1 = minor(ob_lo, ob_hi, db_lo, db_hi, lo_b, cs_b)
    c0, c1 = minor(oc_lo, oc_hi, dc_lo, dc_hi, lo_c, cs_c)
    b0 = jnp.clip(b0, 0, n_b[:, None] - 1)
    b1 = jnp.clip(b1, 0, n_b[:, None] - 1)
    c0 = jnp.clip(c0, 0, n_c[:, None] - 1)
    c1 = jnp.clip(c1, 0, n_c[:, None] - 1)
    rect_ok = k_ok & t_ok

    # qcol flat indexing: per-layout base offsets + per-tile strides.
    qbase_list = []
    off = 0
    for a in range(3):
        da_, db_, dc_ = dims3[a]
        qbase_list.append(off)
        off += da_ * db_ * (dc_ + 1)
    qbase = jnp.array(qbase_list, jnp.int32)[axis]          # (nt,)

    def qidx(k, j, c):
        # (k * Db + j) * (Dc + 1) + c, flattened per layout.
        return (qbase[:, None, None]
                + ((k[:, :, None] * n_b[:, None, None]
                    + j) * (n_c[:, None, None] + 1) + c))

    # c-trimmed row ranges: rows b0, b0+1, ..., b0+RMAX-1 (masked past
    # b1), then one untrimmed tail range for rows [b0+RMAX, b1].
    rr = jnp.arange(_RMAX, dtype=jnp.int32)
    j_r = b0[:, :, None] + rr[None, None, :]                # (nt,S,R)
    row_ok = (j_r <= b1[:, :, None]) & rect_ok[:, :, None]
    j_cl = jnp.minimum(j_r, n_b[:, None, None] - 1)
    k_cl = jnp.clip(ks, 0, n_a[:, None] - 1)
    g1 = qc1[qidx(k_cl, j_cl, c0[:, :, None])]
    g2 = qc2[qidx(k_cl, j_cl, c1[:, :, None] + 1)]
    cnt = jnp.where(row_ok, jnp.maximum(g2 - g1 + 1, 0), 0)

    has_tail = rect_ok & (b1 - b0 + 1 > _RMAX)
    jt = jnp.minimum(b0 + _RMAX, n_b[:, None] - 1)
    t1 = qc1[(qbase[:, None] + (k_cl * n_b[:, None] + jt)
              * (n_c[:, None] + 1))]
    t2 = qc2[(qbase[:, None] + (k_cl * n_b[:, None] + b1)
              * (n_c[:, None] + 1) + n_c[:, None])]
    cnt_t = jnp.where(has_tail, jnp.maximum(t2 - t1 + 1, 0), 0)

    starts = jnp.concatenate([g1, t1[:, :, None]], axis=2).reshape(-1)
    counts = jnp.concatenate([cnt, cnt_t[:, :, None]], axis=2
                             ).reshape(-1)
    return (starts, counts, jnp.sum(counts), jnp.any(live_tile))


@functools.partial(jax.jit, static_argnames=("bucket", "slab", "nt"))
def _items(starts, counts, bucket, slab, nt):
    """Expand the per-(tile, slice, row) panel ranges into item arrays
    padded to `bucket` (padding routed to the dummy tile nt)."""
    src, rank, valid, _ = expand_by_counts(counts, bucket)
    panel_of = jnp.where(valid, starts[src] + rank, 0)
    tile_of = jnp.where(valid, src // (slab * (_RMAX + 1)), nt)
    return tile_of, panel_of


@jax.jit
def _merge(best, out_ext, tile_of):
    """Fold one sweep chunk's output into the running per-ray best.
    Chunks may split a tile's item run; each partial flush merges
    correctly because closest-hit is a min-reduction."""
    best_t, best_id, best_u, best_v = best
    nt, tile = best_t.shape
    touched = jnp.zeros((nt + 1,), jnp.bool_).at[tile_of].set(True)[:nt]
    out3 = out_ext[:nt * tile].reshape(nt, tile, 8)
    t_new = out3[..., 0]
    id_new = jax.lax.bitcast_convert_type(out3[..., 1], jnp.int32)
    improved = touched[:, None] & (t_new < best_t)
    return (jnp.where(improved, t_new, best_t),
            jnp.where(improved, id_new, best_id),
            jnp.where(improved, out3[..., 2], best_u),
            jnp.where(improved, out3[..., 3], best_v))


# ----------------------------------------------------------------------
# Public entry
# ----------------------------------------------------------------------

_CHUNK = 65536  # max items per kernel call (2 x 256K SMEM prefetch)


def _bucket(n: int) -> int:
    b = 256
    while b < n:
        b *= 2
    return b


def trace_sweep(grid: PacketGrid, rays: Rays, any_hit: bool = False,
                interpret: bool = False, tile: int = 512,
                slab: int = 8) -> Hits:
    """Trace rays against a PacketGrid with the planned-sweep kernel."""
    n = rays.count
    x = rays_to_x(rays.org, rays.dir, rays.tmin, rays.tmax)
    n_pad = (-(-n // tile) + 6) * tile
    xp, inv = _bin_rays(x, n_pad, tile)
    nt = n_pad // tile

    cs_tab, n_tab, lo_tab = _tile_tabs(grid)
    per_ray, per_tile = _precompute(xp, cs_tab, n_tab, lo_tab,
                                    grid.bbox_lo, grid.bbox_hi, tile)

    # Dummy tile for padded items.
    dead = jnp.zeros((16,), jnp.float32)
    dead = dead.at[0].set(1.0).at[1].set(-1e30).at[4].set(1.0)
    xp_ext = jnp.concatenate([xp, jnp.broadcast_to(dead, (tile, 16))])

    best = (jnp.full((nt, tile), _BIG, jnp.float32),
            jnp.full((nt, tile), -1, jnp.int32),
            jnp.zeros((nt, tile), jnp.float32),
            jnp.zeros((nt, tile), jnp.float32))
    ka = per_tile["k0"]
    step = per_tile["step"]

    max_rounds = -(-max(d[0] for d in grid.dims3) // slab) + 1
    for _ in range(max_rounds):
        starts, counts, n_items, live = _plan(
            per_ray, per_tile, cs_tab, n_tab, lo_tab, grid.qc1,
            grid.qc2, ka, best[0], grid.dims3, slab, any_hit)
        n_items = int(jax.device_get(n_items))
        if n_items == 0:
            if not bool(jax.device_get(live)):
                break
            ka = ka + step * slab
            continue
        tile_of, panel_of = _items(starts, counts, _bucket(n_items),
                                   slab, nt)
        # SMEM holds ~1M of prefetched scalars; chunk huge item lists.
        for off in range(0, tile_of.shape[0], _CHUNK):
            out_ext = _sweep(xp_ext, grid.reft,
                             tile_of[off:off + _CHUNK],
                             panel_of[off:off + _CHUNK], tile, interpret)
            best = _merge(best, out_ext, tile_of[off:off + _CHUNK])
        ka = ka + step * slab

    out_flat = jnp.stack(
        [best[0].reshape(-1),
         jax.lax.bitcast_convert_type(best[1], jnp.float32).reshape(-1),
         best[2].reshape(-1), best[3].reshape(-1)], axis=1)
    return _unbin(out_flat, inv, n)


@functools.partial(jax.jit, static_argnames=("n",))
def _unbin(out, inv, n):
    safe = jnp.where(inv >= 0, inv, n)
    t = jnp.full((n + 1,), jnp.inf, jnp.float32).at[safe].set(out[:, 0])
    idb = jnp.full((n + 1,), -1, jnp.int32).at[safe].set(
        jax.lax.bitcast_convert_type(out[:, 1], jnp.int32))
    u = jnp.zeros((n + 1,), jnp.float32).at[safe].set(out[:, 2])
    v = jnp.zeros((n + 1,), jnp.float32).at[safe].set(out[:, 3])
    tri = idb[:n]
    found = tri >= 0
    return Hits(tri_id=tri, t=jnp.where(found, t[:n], jnp.inf),
                u=u[:n], v=v[:n])
