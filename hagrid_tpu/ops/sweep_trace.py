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
   per-tile scalars) is turned into contiguous panel-id RANGES via the
   build-time qcol tables (grid/packet.py) — two gathers per rect row,
   one expand_by_counts, no device-wide scatters. Rects are also
   computed per quarter-tile; each range carries a 4-bit subtile mask
   so the kernel can skip ray quarters that cannot see the panel.

2. **Pallas sweep kernel (zero scalar control).** grid = (n_items,),
   DYNAMIC — sized by the traced item count, so empty rounds and slack
   cost nothing. Scalar-prefetched item arrays drive the BlockSpec
   index maps (tile revisits are free; panel blocks double-buffer
   automatically). The body is dense exact-f32 Moller-Trumbore of the
   masked ray quarters x 128 tris on the VPU plus lane-accumulator
   updates; per-tile results flush when the item stream moves on.

3. **Device-side round loop.** The whole frame — every round's plan,
   expand, sweep, merge — is ONE jitted computation with ZERO
   device->host reads: on this environment a single D2H read
   permanently degrades every later dispatch (measured ~24 ms/sync,
   see memory notes), so rounds are statically unrolled and the item
   budget is a static capacity with an overflow flag checked once at
   the end of the frame, not a host-sized bucket.

Numerics: the VPU path is plain f32 — exact parity with the oracle,
unlike bf16 MXU passes (round 1 measured ~1% flipped hits at DEFAULT
precision; 3-pass HIGH costs more than the 33-op VPU form).
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
_SUB = 4        # ray quarters per tile (subtile mask granularity)
_RMAX = 8       # c-trimmed row ranges per (tile, slice); taller rects
#                 fall back to one untrimmed multi-row tail range.
_CHUNK = 131072  # items per pallas_call (1 x 512K SMEM prefetch)
# Item encoding: one i32 per item — (tile << 20) | (panel << 4) | mask.
# tile < 4096 (dummy tile included), panel < 65536, 4-bit subtile mask.
_TSHIFT = 20
_PSHIFT = 4


# ----------------------------------------------------------------------
# Kernel
# ----------------------------------------------------------------------

def _tile_bits(item):
    return jax.lax.shift_right_logical(item, _TSHIFT)


def _make_kernel(tile: int, nt: int):
    sub = tile // _SUB

    def kernel(items, x_ref, reft_ref, out_ref,
               acc_t, acc_id, acc_u, acc_v):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        t_cur = _tile_bits(items[i])
        mask = items[i] & 15
        # First/last item of this tile's run, derived from neighbors
        # (prefetched arrays live in 1M SMEM — every array counts, so
        # tile/panel/mask share one packed i32).
        first = (i == 0) | (t_cur != _tile_bits(items[jnp.maximum(
            i - 1, 0)]))
        last = (i == n - 1) | (t_cur != _tile_bits(items[jnp.minimum(
            i + 1, n - 1)]))

        @pl.when(first & (t_cur < nt))
        def _():
            acc_t[:] = jnp.full((tile, 128), _BIG, jnp.float32)
            acc_id[:] = jnp.full((tile, 128), -1.0, jnp.float32)
            acc_u[:] = jnp.zeros((tile, 128), jnp.float32)
            acc_v[:] = jnp.zeros((tile, 128), jnp.float32)

        # Per-panel triangle rows, broadcast across lanes.
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

        def mt_quarter(s):
            r0, r1 = s * sub, (s + 1) * sub
            ox = x_ref[r0:r1, 1:2]
            oy = x_ref[r0:r1, 2:3]
            oz = x_ref[r0:r1, 3:4]
            dx = x_ref[r0:r1, 4:5]
            dy = x_ref[r0:r1, 5:6]
            dz = x_ref[r0:r1, 6:7]
            tmin = x_ref[r0:r1, 12:13]
            tmax = x_ref[r0:r1, 13:14]
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
            inv = 1.0 / det      # det = 0 -> inf/NaN, self-filtered
            t = tt * inv
            u = uu * inv
            v = vv * inv
            # min-form barycentric test; NaN/inf compare false. The eps
            # guard keeps near-parallel slivers from phantom far hits.
            edge = jnp.minimum(jnp.minimum(u, v), 1.0 - (u + v))
            ok = ((edge >= 0.0) & (jnp.abs(det) > 1e-12)
                  & (t > tmin) & (t < tmax))
            better = ok & (t < acc_t[r0:r1])
            acc_t[r0:r1] = jnp.where(better, t, acc_t[r0:r1])
            acc_id[r0:r1] = jnp.where(
                better, jnp.broadcast_to(ids, (sub, 128)), acc_id[r0:r1])
            acc_u[r0:r1] = jnp.where(better, u, acc_u[r0:r1])
            acc_v[r0:r1] = jnp.where(better, v, acc_v[r0:r1])

        for s in range(_SUB):
            @pl.when(((mask >> s) & 1) != 0)
            def _(s=s):
                mt_quarter(s)

        @pl.when(last & (t_cur < nt))
        def _():
            bt = jnp.min(acc_t[:], axis=1)
            at_min = acc_t[:] == bt[:, None]
            idi = jax.lax.bitcast_convert_type(acc_id[:], jnp.int32)
            id_min = jnp.min(jnp.where(at_min & (idi >= 0), idi,
                                       _BIGID), axis=1)
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


def _sweep(xp_ext, reft, items, tile, interpret):
    """One item-chunk sweep over a STATIC grid (a dynamic Mosaic grid
    disables the block pipeline: measured 15us/item vs 1.8us static).
    Dead items (tile bits == nt) are skipped by the kernel's pl.when
    guards and revisit the dummy blocks, costing only bookkeeping."""
    n_rows = xp_ext.shape[0]
    nt = n_rows // tile - 1
    grid = (items.shape[0],)

    def panel_bits(v):
        return jax.lax.shift_right_logical(v, _PSHIFT) & 0xFFFF

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 16), lambda i, it: (_tile_bits(it[i]),
                                                    0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda i, it: (0,
                                                   panel_bits(it[i])),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 8),
                               lambda i, it: (_tile_bits(it[i]), 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_kernel(tile, nt),
        out_shape=jax.ShapeDtypeStruct((n_rows, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(items, xp_ext, reft)


# ----------------------------------------------------------------------
# Binning and per-tile precompute (all XLA)
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_pad", "tile"))
def _bin_rays(org, dir, tmin, tmax, n_pad, tile):
    """Group rays by (major axis, sign) into tile-aligned segments via
    masked cumsums (counting sort; no device-wide lax.sort). Returns
    (xp_ext, inv): the permuted X matrix with a trailing all-dead dummy
    tile, and row -> original ray (-1 for padding)."""
    x = rays_to_x(org, dir, tmin, tmax)
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

    # Scatter a 1-int permutation, then GATHER the 16-float rows (a
    # 64MB row scatter lowers poorly; the 4MB index scatter + row
    # gather is ~10x cheaper). inv == -1 rows become the dead ray.
    inv = jnp.full((n_pad + tile,), -1, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    dead = jnp.zeros((16,), jnp.float32)
    dead = dead.at[0].set(1.0).at[1].set(-1e30).at[4].set(1.0)
    xp_ext = jnp.where((inv >= 0)[:, None],
                       x[jnp.maximum(inv, 0)], dead[None, :])
    return xp_ext, inv[:n_pad]


def _tile_tabs(bbox_lo, bbox_hi, dims3):
    """Per-layout (cs, dims, lo) tables in (slice, row, col) order.
    Traced (tiny) — called inside the frame jit."""
    ext = bbox_hi - bbox_lo
    cs_rows, n_rows, lo_rows = [], [], []
    for a in range(3):
        da, db, dc = dims3[a]
        b, c = (a + 1) % 3, (a + 2) % 3
        cs_rows.append(jnp.stack([ext[a] / da, ext[b] / db, ext[c] / dc]))
        n_rows.append(jnp.array([da, db, dc], jnp.int32))
        lo_rows.append(jnp.stack([bbox_lo[a], bbox_lo[b], bbox_lo[c]]))
    return (jnp.stack(cs_rows), jnp.stack(n_rows), jnp.stack(lo_rows))


def _precompute(xp, cs_tab, n_tab, lo_tab, bbox_lo, bbox_hi, tile):
    """Static per-ray / per-tile quantities for the round loop.
    Traced — called inside the frame jit."""
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
# Round planning (all XLA, inside the frame jit)
# ----------------------------------------------------------------------

def _plan(per_ray, per_tile, cs_tab, n_tab, lo_tab, qc1, qc2, ka,
          best_t, dims3, slab, any_hit):
    """One slab's plan. Returns (range_start*16+submask, range_count)
    flattened over (tile, slice, RMAX row slots + 1 tail slot)."""
    axis = per_tile["axis"]
    step = per_tile["step"]
    nt = axis.shape[0]
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

    # Frustum bounds per QUARTER tile (rays are Morton-ordered, so
    # quarters are spatially coherent); full-tile bounds are the union.
    def q(v):  # (nt, tile) -> (nt, SUB, tile/SUB)
        return v.reshape(nt, _SUB, -1)

    liveq = q(live)

    def mnq(v):
        return jnp.min(jnp.where(liveq, q(v), _BIG), axis=2)

    def mxq(v):
        return jnp.max(jnp.where(liveq, q(v), -_BIG), axis=2)

    ob_lo, ob_hi = mnq(per_ray["o_b"]), mxq(per_ray["o_b"])
    oc_lo, oc_hi = mnq(per_ray["o_c"]), mxq(per_ray["o_c"])
    db_lo, db_hi = mnq(per_ray["d_b"]), mxq(per_ray["d_b"])
    dc_lo, dc_hi = mnq(per_ray["d_c"]), mxq(per_ray["d_c"])
    oa_lo, oa_hi = mnq(per_ray["o_a"]), mxq(per_ray["o_a"])
    ia_lo, ia_hi = mnq(per_ray["inv_a"]), mxq(per_ray["inv_a"])
    t_lo0 = jnp.maximum(mnq(per_ray["enter"]), 0.0)
    t_cap = mxq(jnp.minimum(jnp.minimum(best_t, per_ray["tmax"]),
                            per_ray["leave"]))
    live_tile = jnp.any(live, axis=1)

    # Slab slices: (nt, S); per-quarter per-slice t range and rect.
    ks = ka[:, None] + step[:, None] * jnp.arange(slab, dtype=jnp.int32)
    k_ok = (ks >= 0) & (ks < n_a[:, None]) & live_tile[:, None]
    kf = ks.astype(jnp.float32)
    pl0 = lo_a[:, None] + kf * cs_a[:, None]           # (nt, S)
    pl1 = pl0 + cs_a[:, None]

    def tq(p):  # (nt,S) plane x (nt,SUB) bounds -> (nt,SUB,S)
        cands = []
        for oe in (oa_lo, oa_hi):
            for ie in (ia_lo, ia_hi):
                cands.append((p[:, None, :] - oe[:, :, None])
                             * ie[:, :, None])
        return cands

    cands = tq(pl0) + tq(pl1)
    tl = functools.reduce(jnp.minimum, cands)
    th = functools.reduce(jnp.maximum, cands)
    tl = jnp.maximum(tl, t_lo0[:, :, None])
    th = jnp.minimum(th, t_cap[:, :, None])
    t_ok = tl <= th                                     # (nt,SUB,S)

    def minor(olo, ohi, dlo, dhi, lo_m, cs_m, n_m):
        x00 = tl * dlo[:, :, None]
        x01 = tl * dhi[:, :, None]
        x10 = th * dlo[:, :, None]
        x11 = th * dhi[:, :, None]
        vlo = olo[:, :, None] + jnp.minimum(jnp.minimum(x00, x01),
                                            jnp.minimum(x10, x11))
        vhi = ohi[:, :, None] + jnp.maximum(jnp.maximum(x00, x01),
                                            jnp.maximum(x10, x11))
        ics = (1.0 / cs_m)[:, None, None]
        lo_i = ((vlo - lo_m[:, None, None]) * ics).astype(jnp.int32)
        hi_i = ((vhi - lo_m[:, None, None]) * ics).astype(jnp.int32)
        return (jnp.clip(lo_i, 0, n_m[:, None, None] - 1),
                jnp.clip(hi_i, 0, n_m[:, None, None] - 1))

    b0q, b1q = minor(ob_lo, ob_hi, db_lo, db_hi, lo_b, cs_b, n_b)
    c0q, c1q = minor(oc_lo, oc_hi, dc_lo, dc_hi, lo_c, cs_c, n_c)
    rect_okq = t_ok & k_ok[:, None, :]                  # (nt,SUB,S)
    # Full-tile rect = union over live quarters.
    ibig = jnp.int32(2 ** 20)
    b0 = jnp.min(jnp.where(rect_okq, b0q, ibig), axis=1)   # (nt,S)
    b1 = jnp.max(jnp.where(rect_okq, b1q, -1), axis=1)
    c0 = jnp.min(jnp.where(rect_okq, c0q, ibig), axis=1)
    c1 = jnp.max(jnp.where(rect_okq, c1q, -1), axis=1)
    rect_ok = jnp.any(rect_okq, axis=1)
    b0 = jnp.where(rect_ok, b0, 0)
    b1 = jnp.where(rect_ok, b1, 0)
    c0 = jnp.where(rect_ok, c0, 0)
    c1 = jnp.where(rect_ok, c1, 0)

    # qcol flat indexing: per-layout base offsets + per-tile strides.
    qbase_list = []
    off = 0
    for a in range(3):
        da_, db_, dc_ = dims3[a]
        qbase_list.append(off)
        off += da_ * db_ * (dc_ + 1)
    qbase = jnp.array(qbase_list, jnp.int32)[axis]          # (nt,)

    def qidx(k, j, c):
        return (qbase[:, None, None]
                + ((k[:, :, None] * n_b[:, None, None]
                    + j) * (n_c[:, None, None] + 1) + c))

    # c-trimmed row ranges + untrimmed multi-row tail.
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

    # Subtile masks. Row slots: quarter sees the range iff its rect
    # covers row j and overlaps the tile's col range (panel cols are a
    # subset of [c0, c1], so this is conservative). Tail slot: quarter
    # row-range overlaps the tail rows.
    def bit(cond, s):
        return cond.astype(jnp.int32) << s

    mask_rows = jnp.zeros(j_r.shape, jnp.int32)
    mask_tail = jnp.zeros(cnt_t.shape, jnp.int32)
    for s in range(_SUB):
        row_in = ((j_r >= b0q[:, s, :, None]) & (j_r <= b1q[:, s, :, None])
                  & (c0q[:, s, :, None] <= c1[:, :, None])
                  & (c1q[:, s, :, None] >= c0[:, :, None])
                  & rect_okq[:, s, :, None])
        mask_rows = mask_rows | bit(row_in, s)
        tail_in = ((b1q[:, s, :] >= jt) & (b0q[:, s, :] <= b1)
                   & rect_okq[:, s, :])
        mask_tail = mask_tail | bit(tail_in, s)
    cnt = jnp.where(mask_rows > 0, cnt, 0)
    cnt_t = jnp.where(mask_tail > 0, cnt_t, 0)

    starts = jnp.concatenate([g1 * 16 + mask_rows,
                              (t1 * 16 + mask_tail)[:, :, None]],
                             axis=2).reshape(-1)
    counts = jnp.concatenate([cnt, cnt_t[:, :, None]], axis=2
                             ).reshape(-1)
    return starts, counts


def _items(starts, counts, bmax, slab, nt):
    """Expand panel ranges into ONE packed item array of static
    capacity bmax: (tile << 20) | (panel << 4) | submask. Packing may
    wrap into the sign bit for tile >= 2048 — decoding always uses
    logical shifts. Invalid slots route to the dummy tile nt."""
    src, rank, valid, total = expand_by_counts(counts, bmax)
    pm = starts[src] + rank * 16          # (panel << 4) | mask
    tile_of = src // (slab * (_RMAX + 1))
    # nt << 20 can exceed int32 as a Python literal (nt >= 2048); shift
    # on-device so it wraps into the sign bit like every other item.
    dummy = jnp.left_shift(jnp.int32(nt), _TSHIFT)
    items = jnp.where(valid,
                      jnp.left_shift(tile_of, _TSHIFT) + pm, dummy)
    return items, jnp.minimum(total, bmax), total


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
# Whole-frame jit: all rounds, zero device->host reads
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "dims3", "slab", "any_hit", "tile", "bmax", "max_rounds",
    "interpret"))
def _frame(xp_ext, bbox_lo, bbox_hi, qc1, qc2,
           reft, dims3, slab, any_hit, tile, bmax, max_rounds,
           interpret):
    nt = xp_ext.shape[0] // tile - 1
    cs_tab, n_tab, lo_tab = _tile_tabs(bbox_lo, bbox_hi, dims3)
    per_ray, per_tile = _precompute(xp_ext[:nt * tile], cs_tab, n_tab,
                                    lo_tab, bbox_lo, bbox_hi, tile)
    best = (jnp.full((nt, tile), _BIG, jnp.float32),
            jnp.full((nt, tile), -1, jnp.int32),
            jnp.zeros((nt, tile), jnp.float32),
            jnp.zeros((nt, tile), jnp.float32))
    ka = per_tile["k0"]
    step = per_tile["step"]
    overflow = jnp.int32(0)
    for _ in range(max_rounds):
        starts, counts = _plan(per_ray, per_tile, cs_tab, n_tab,
                               lo_tab, qc1, qc2, ka, best[0], dims3,
                               slab, any_hit)
        items, n_items, total = _items(starts, counts, bmax, slab, nt)
        overflow = overflow | (total > bmax)
        # Pow2 chunk ladder: a round with k items runs only the gated
        # chunks covering it, so slack past n_items costs at most ~one
        # chunk of cheap dead-item skips.
        off = 0
        w = 4096
        while off < bmax:
            w = min(w, bmax - off)
            it_c = items[off:off + w]

            def do_chunk(best, it_c=it_c):
                out_ext = _sweep(xp_ext, reft, it_c, tile, interpret)
                return _merge(best, out_ext, _tile_bits(it_c))

            # Empty chunks (and whole empty rounds) cost nothing.
            best = jax.lax.cond(n_items > off, do_chunk,
                                lambda b: b, best)
            off += w
            w = min(2 * w, _CHUNK)
        ka = ka + step * slab
    return best, overflow


# ----------------------------------------------------------------------
# Public entry
# ----------------------------------------------------------------------

def trace_sweep(grid: PacketGrid, rays: Rays, any_hit: bool = False,
                interpret: bool = False, tile: int = 512,
                slab: int = 16, bmax: int | None = None,
                return_overflow: bool = False):
    """Trace rays against a PacketGrid with the planned-sweep kernel.

    The frame runs as one jitted computation with no host syncs. If a
    round selects more than `bmax` items, the surplus is dropped and
    the device-side overflow flag is set (request it with
    return_overflow=True, or raise bmax). On the CPU backend the kernel
    falls back to interpret mode (Mosaic is TPU-only)."""
    if jax.default_backend() == "cpu":
        interpret = True
    n = rays.count
    n_pad = (-(-n // tile) + 6) * tile
    if bmax is None:
        bmax = min(262144, max(2048, 16 * (n_pad // tile) * slab))
    # Packed-item encoding limits (see _items): 12-bit tile, 16-bit
    # panel. Trace more rays in several calls / raise `tile` if hit.
    if n_pad // tile + 1 > 4095:
        raise ValueError(
            f"{n_pad // tile} ray tiles exceeds the 12-bit item "
            f"encoding; raise tile= or split the ray batch")
    if 3 * grid.panels_per_layout > 65536:
        raise ValueError(
            f"{3 * grid.panels_per_layout} panels exceeds the 16-bit "
            f"item encoding; lower densities or ref_capacity")
    xp_ext, inv = _bin_rays(rays.org, rays.dir, rays.tmin, rays.tmax,
                            n_pad, tile)

    max_rounds = -(-max(d[0] for d in grid.dims3) // slab) + 1
    best, overflow = _frame(xp_ext, grid.bbox_lo, grid.bbox_hi,
                            grid.qc1, grid.qc2, grid.reft,
                            grid.dims3, slab, any_hit, tile, bmax,
                            max_rounds, interpret)

    out_flat = jnp.stack(
        [best[0].reshape(-1),
         jax.lax.bitcast_convert_type(best[1], jnp.float32).reshape(-1),
         best[2].reshape(-1), best[3].reshape(-1)], axis=1)
    hits = _unbin(out_flat, inv, n)
    if return_overflow:
        return hits, overflow
    return hits


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
