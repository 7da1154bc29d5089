"""Coherent packet traversal — the flagship Pallas TPU kernel.

Counterpart of the reference's traverse_grid hot loop (src/traverse.cu,
one CUDA thread per ray). A TPU core has no SIMT latency hiding, so the
per-ray design is inverted into a *packet* design (SURVEY.md §2: rays
tiled into VMEM, batched HBM block loads, vectorized slab+MT):

- Rays are binned into TILE-sized packets sharing a dominant direction
  axis and sign (6 groups); within a packet rays are image/Morton
  coherent, so the packet's frustum is narrow.
- One pallas program marches one packet slice-by-slice along the major
  axis. The frustum's cross-section in each slice is a small [b0..b1] x
  [c0..c1] rect of cells, computed from 8 precomputed scalar bounds — no
  per-ray work for empty space.
- The packet grid (grid/packet.py) stores cells slice-major per axis, so
  each rect row's cell boundaries and its triangles are contiguous runs:
  one async DMA each, no gathers anywhere.
- Each run is tested densely: 4 MXU contractions (K=8) produce the
  Moller-Trumbore quantities for all (TILE x RCHUNK) ray/tri pairs at
  once, and a short VPU epilogue updates per-(ray, lane) best-hit
  accumulators. A ray packet is done when every ray's best hit precedes
  the next slice (the standard grid early-out, vectorized).

Mosaic constraints honored (measured in round 1, see memory notes):
componentwise math only (no jnp.cross/(N,3) slicing in-kernel), no
per-lane gathers — all memory movement is block DMA + scalar reads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Hits, Rays
from ..grid.packet import PacketGrid, rays_to_x

TILE = 1024    # rays per packet (one grid program)
RCHUNK = 128   # triangle refs per dense panel
# The starts window is a (SCHUNK, BWIN, CWIN) block. Mosaic DMA offsets
# must be aligned (sublane: 8, lane: 128), so the window is anchored at
# aligned coordinates and sized 2x the alignment: any 8-row / 129-col
# rect anchored anywhere fits a single aligned window.
SCHUNK = 8     # slices per window
BWIN = 16      # rect rows per window (8-aligned anchor)
CWIN = 256     # rect cols per window (128-aligned anchor)

_BIG = 3e38    # finite stand-in for +inf (inf * 0 = NaN poisons selects)


def _sel3(axis, x, y, z):
    """Select one of three values by a traced scalar axis id (0/1/2).

    Works for scalars and vectors alike without relying on Mosaic's
    scalar-pred select lowering: pure arithmetic masks."""
    fx = (axis == 0).astype(jnp.float32)
    fy = (axis == 1).astype(jnp.float32)
    fz = (axis == 2).astype(jnp.float32)
    return fx * x + fy * y + fz * z


def _isel3(axis, x, y, z):
    ix = (axis == 0).astype(jnp.int32)
    iy = (axis == 1).astype(jnp.int32)
    iz = (axis == 2).astype(jnp.int32)
    return ix * x + iy * y + iz * z


def _make_kernel(dims3, r_cap, any_hit: bool):
    # Per-layout extents, already permuted to (slice, row, col) order.
    da_l = tuple(int(dims3[a][0]) for a in range(3))
    db_l = tuple(int(dims3[a][1]) for a in range(3))
    dc_l = tuple(int(dims3[a][2]) for a in range(3))
    # Padded slice-count extents (mirrors grid/packet.py's PAD_A): the
    # b/c window anchors need no clamping — pad_b/pad_c1 padding
    # guarantees any aligned window anchored at a logical coordinate
    # stays in bounds.
    from ..grid.packet import PAD_A
    pda_l = tuple(max(d, PAD_A) for d in da_l)

    def kernel(meta_ref, x_ref, sx, sy, sz, qx, qy, qz, ix, iy, iz,
               out_ref, win, rr, rq, rid, acc_t, acc_id, acc_u, acc_v,
               best_ref, sem_win, sem_rq, sem_rid):
        # ------------------------------------------------------------------
        # Per-tile setup.
        # ------------------------------------------------------------------
        ox = x_ref[:, 1]
        oy = x_ref[:, 2]
        oz = x_ref[:, 3]
        dxv = x_ref[:, 4]
        dyv = x_ref[:, 5]
        dzv = x_ref[:, 6]
        tmin = x_ref[:, 12]
        tmax = x_ref[:, 13]

        # Dominant axis + sign from ray 0 (tiles are grouped by (axis,
        # sign); all-dead padding tiles get axis=0 harmlessly).
        ax0 = jnp.abs(x_ref[0, 4])
        ay0 = jnp.abs(x_ref[0, 5])
        az0 = jnp.abs(x_ref[0, 6])
        axis = jnp.where(ax0 >= jnp.maximum(ay0, az0), 0,
                         jnp.where(ay0 >= az0, 1, 2)).astype(jnp.int32)
        d0 = _sel3(axis, x_ref[0, 4], x_ref[0, 5], x_ref[0, 6])
        step = jnp.where(d0 < 0, -1, 1).astype(jnp.int32)

        n_a = _isel3(axis, da_l[0], da_l[1], da_l[2])
        n_b = _isel3(axis, db_l[0], db_l[1], db_l[2])
        n_c = _isel3(axis, dc_l[0], dc_l[1], dc_l[2])
        p_a = _isel3(axis, pda_l[0], pda_l[1], pda_l[2])

        # meta = [lo_xyz (3), cs of layout x (slice,row,col), cs of
        # layout y, cs of layout z, pad] — layouts have independent
        # anisotropic grids, so cell sizes are per layout.
        ax1 = (axis + 1) % 3
        ax2 = (axis + 2) % 3
        lo_a = _sel3(axis, meta_ref[0], meta_ref[1], meta_ref[2])
        lo_b = _sel3(ax1, meta_ref[0], meta_ref[1], meta_ref[2])
        lo_c = _sel3(ax2, meta_ref[0], meta_ref[1], meta_ref[2])
        cs_a = _sel3(axis, meta_ref[3], meta_ref[6], meta_ref[9])
        cs_b = _sel3(axis, meta_ref[4], meta_ref[7], meta_ref[10])
        cs_c = _sel3(axis, meta_ref[5], meta_ref[8], meta_ref[11])

        # Permuted per-ray components (arithmetic-mask select).
        o_a = _sel3(axis, ox, oy, oz)
        o_b = _sel3(ax1, ox, oy, oz)
        o_c = _sel3(ax2, ox, oy, oz)
        d_a = _sel3(axis, dxv, dyv, dzv)
        d_b = _sel3(ax1, dxv, dyv, dzv)
        d_c = _sel3(ax2, dxv, dyv, dzv)

        def inv(d):
            nz = jnp.abs(d) > 1e-30
            return jnp.where(nz, 1.0 / jnp.where(nz, d, 1.0),
                             jnp.where(d < 0, -_BIG, _BIG))

        inv_a = inv(d_a)
        inv_b = inv(d_b)
        inv_c = inv(d_c)

        # Slab test vs the scene box, componentwise over (a, b, c).
        hi_a = lo_a + n_a.astype(jnp.float32) * cs_a
        hi_b = lo_b + n_b.astype(jnp.float32) * cs_b
        hi_c = lo_c + n_c.astype(jnp.float32) * cs_c

        def slab1(o, i, lo, hi):
            t0 = (lo - o) * i
            t1 = (hi - o) * i
            bad = jnp.isnan(t0 * t1)
            return (jnp.where(bad, -_BIG, jnp.minimum(t0, t1)),
                    jnp.where(bad, _BIG, jnp.maximum(t0, t1)))

        na, fa = slab1(o_a, inv_a, lo_a, hi_a)
        nb, fb = slab1(o_b, inv_b, lo_b, hi_b)
        nc, fc = slab1(o_c, inv_c, lo_c, hi_c)
        enter = jnp.maximum(jnp.maximum(na, nb),
                            jnp.maximum(nc, tmin))
        leave = jnp.minimum(jnp.minimum(fa, fb),
                            jnp.minimum(fc, tmax))
        alive = enter <= leave

        # Scalar frustum bounds over live rays (conservative; exact for
        # common-origin packets). All slice-rect math below is scalar.
        def mn(v):
            return jnp.min(jnp.where(alive, v, _BIG))

        def mx(v):
            return jnp.max(jnp.where(alive, v, -_BIG))

        ob_lo, ob_hi = mn(o_b), mx(o_b)
        oc_lo, oc_hi = mn(o_c), mx(o_c)
        db_lo, db_hi = mn(d_b), mx(d_b)
        dc_lo, dc_hi = mn(d_c), mx(d_c)
        oa_lo, oa_hi = mn(o_a), mx(o_a)
        ia_lo, ia_hi = mn(inv_a), mx(inv_a)
        t_lo0 = jnp.maximum(mn(enter), 0.0)
        t_hi0 = mx(jnp.where(alive, leave, -_BIG))

        # First slice from the packet's entry points.
        pa_in = o_a + enter * d_a
        k0 = jnp.where(
            step > 0,
            jnp.floor((mn(pa_in) - lo_a) / cs_a),
            jnp.floor((mx(pa_in) - lo_a) / cs_a)).astype(jnp.int32)
        k0 = jnp.clip(k0, 0, n_a - 1)

        # Init accumulators.
        inf_panel = jnp.full((TILE, RCHUNK), _BIG, jnp.float32)
        acc_t[:] = inf_panel
        acc_id[:] = jnp.full((TILE, RCHUNK), -1.0, jnp.float32)
        acc_u[:] = jnp.zeros((TILE, RCHUNK), jnp.float32)
        acc_v[:] = jnp.zeros((TILE, RCHUNK), jnp.float32)
        best_ref[:] = jnp.full((TILE,), _BIG, jnp.float32)

        tmin2 = tmin[:, None]
        tmax2 = tmax[:, None]

        def fetch_window(kw, jw, cw):
            # Re-derive alignment right at the slice expression: Mosaic's
            # divisibility analysis does not track it through loop
            # carries/selects, only through syntactic (x // n) * n.
            jw = (jw // 8) * 8
            cw = (cw // 128) * 128

            def start(tab):
                cp = pltpu.make_async_copy(
                    tab.at[pl.ds(kw, SCHUNK), pl.ds(jw, BWIN),
                           pl.ds(cw, CWIN)],
                    win, sem_win)
                cp.start()
                cp.wait()

            @pl.when(axis == 0)
            def _():
                start(sx)

            @pl.when(axis == 1)
            def _():
                start(sy)

            @pl.when(axis == 2)
            def _():
                start(sz)

        def fetch_refs(r0):
            def start(qt, it):
                cq = pltpu.make_async_copy(
                    qt.at[:, pl.ds(4 * r0, 4 * RCHUNK)], rq, sem_rq)
                ci = pltpu.make_async_copy(
                    it.at[:, pl.ds(r0, RCHUNK)], rid, sem_rid)
                cq.start()
                ci.start()
                cq.wait()
                ci.wait()

            @pl.when(axis == 0)
            def _():
                start(qx, ix)

            @pl.when(axis == 1)
            def _():
                start(qy, iy)

            @pl.when(axis == 2)
            def _():
                start(qz, iz)

        xmm = x_ref[:]  # full 16 cols; refq rows 12:16 are zero

        def run_panel(base):
            """Test the aligned 128-ref window at `base` densely vs all
            rays. No lane-range mask: refs outside the caller's run are
            real triangles of this layout, so any MT hit they produce is
            a true intersection (conservative-correct, like span merge);
            dead tail rows are all-zero -> det = 0 -> rejected."""
            base = (base // RCHUNK) * RCHUNK
            fetch_refs(base)
            # ONE K=16 contraction yields all four MT quantities as
            # 128-wide slices of Y (the refq layout is 128-ref blocked).
            # HIGHEST: true f32 accumulation on the MXU. The default
            # (bf16 passes) loses ~8 mantissa bits and flips ~1% of hits
            # near triangle edges (measured vs the oracle on TPU).
            y = jnp.dot(xmm, rq[:], precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
            y_t = y[:, 0:RCHUNK]
            y_d = y[:, RCHUNK:2 * RCHUNK]
            y_u = y[:, 2 * RCHUNK:3 * RCHUNK]
            y_v = y[:, 3 * RCHUNK:4 * RCHUNK]
            iv = 1.0 / y_d  # det=0 -> inf/NaN, self-filtered below
            t = y_t * iv
            u = y_u * iv
            v = y_v * iv
            # min-form barycentric test; NaN/inf compare false, and the
            # eps guard keeps near-parallel slivers from reporting
            # phantom far hits (t_num/det blows up but stays < BIG).
            edge = jnp.minimum(jnp.minimum(u, v), 1.0 - (u + v))
            ok = ((edge >= 0.0) & (jnp.abs(y_d) > 1e-12)
                  & (t > tmin2) & (t < tmax2))
            better = ok & (t < acc_t[:])
            acc_t[:] = jnp.where(better, t, acc_t[:])
            acc_id[:] = jnp.where(better, jnp.broadcast_to(
                rid[:], (TILE, RCHUNK)), acc_id[:])
            acc_u[:] = jnp.where(better, u, acc_u[:])
            acc_v[:] = jnp.where(better, v, acc_v[:])

        # ------------------------------------------------------------------
        # Slice march. Window state is carried in the while loop.
        # ------------------------------------------------------------------
        def rect_of(k, th_cap):
            """Conservative [b0,b1]x[c0,c1] of the frustum in slice k.
            th_cap: running upper bound on useful t (shrinks as rays
            find hits, collapsing the rect near the end of the march)."""
            kf = k.astype(jnp.float32)
            pl0 = lo_a + kf * cs_a
            pl1 = pl0 + cs_a
            # t range over rays for plane p: (p - o_a) * inv_a with o_a in
            # [oa_lo, oa_hi], inv_a in [ia_lo, ia_hi] (same sign group).
            cands = []
            for p in (pl0, pl1):
                for o in (oa_lo, oa_hi):
                    for i in (ia_lo, ia_hi):
                        cands.append((p - o) * i)
            tl = jnp.maximum(jnp.minimum(
                jnp.minimum(jnp.minimum(cands[0], cands[1]),
                            jnp.minimum(cands[2], cands[3])),
                jnp.minimum(jnp.minimum(cands[4], cands[5]),
                            jnp.minimum(cands[6], cands[7]))), t_lo0)
            th = jnp.minimum(jnp.minimum(jnp.maximum(
                jnp.maximum(jnp.maximum(cands[0], cands[1]),
                            jnp.maximum(cands[2], cands[3])),
                jnp.maximum(jnp.maximum(cands[4], cands[5]),
                            jnp.maximum(cands[6], cands[7]))), t_hi0),
                th_cap)

            def minor(olo, ohi, dlo, dhi, lo_m, ics):
                x00 = tl * dlo
                x01 = tl * dhi
                x10 = th * dlo
                x11 = th * dhi
                vlo = olo + jnp.minimum(jnp.minimum(x00, x01),
                                        jnp.minimum(x10, x11))
                vhi = ohi + jnp.maximum(jnp.maximum(x00, x01),
                                        jnp.maximum(x10, x11))
                return ((vlo - lo_m) * ics).astype(jnp.int32), \
                       ((vhi - lo_m) * ics).astype(jnp.int32)

            b0, b1 = minor(ob_lo, ob_hi, db_lo, db_hi, lo_b, 1.0 / cs_b)
            c0, c1 = minor(oc_lo, oc_hi, dc_lo, dc_hi, lo_c, 1.0 / cs_c)
            b0 = jnp.clip(b0, 0, n_b - 1)
            b1 = jnp.clip(b1, 0, n_b - 1)
            c0 = jnp.clip(c0, 0, n_c - 1)
            c1 = jnp.clip(c1, 0, n_c - 1)
            return b0, b1, c0, c1

        lane_w = jax.lax.broadcasted_iota(jnp.int32, (BWIN, CWIN), 1)

        CHECK = 4  # slices per termination check (amortizes the
        #            vector reductions + scalar syncs of the check;
        #            measured ~4us/slice of loop-frame overhead before)

        def slice_body(state):
            k0s, kw, jw, cw, has_win, _ = state
            t_cap = jnp.max(jnp.where(
                alive, jnp.minimum(jnp.minimum(best_ref[:], tmax), leave),
                -_BIG))

            def one_slice(si, kjc):
                kw, jw, cw, has_win = kjc
                k = k0s + si * step
                in_range = (k >= 0) & (k < n_a)
                b0, b1, c0, c1 = rect_of(k, t_cap)

                # Column segments (<=128 cells: one aligned window each)
                # x row windows (<=16 rows each). Typical rects are ~3x3,
                # so both loops run once and the window persists across
                # slices; `need` refetches only when (k, rect) drifts out
                # of it. Mosaic cannot read VMEM scalars at dynamic LANE
                # indices, so per-row run boundaries are extracted as
                # masked lane reductions into rr[:, 0:2] and read back
                # with dynamic SUBLANE indices only.
                nseg = jnp.where(in_range, (c1 - c0) // 128 + 1, 0)
                jbase = (b0 // 8) * 8
                nrw = (b1 - jbase) // BWIN + 1

                def seg_body(cseg, kjc):
                    cc = c0 + cseg * 128
                    ce = jnp.minimum(cc + 127, c1)

                    def rw_body(rwi, kjc):
                        kw, jw, cw, has_win = kjc
                        jlo = jnp.maximum(b0, jbase + rwi * BWIN)
                        jhi = jnp.minimum(b1, jbase + rwi * BWIN
                                          + BWIN - 1)
                        need = ((has_win == 0)
                                | (k < kw) | (k >= kw + SCHUNK)
                                | (jlo < jw) | (jhi >= jw + BWIN)
                                | (cc < cw) | (ce + 1 >= cw + CWIN))
                        nkw = jnp.clip(
                            jnp.where(step > 0, k, k - (SCHUNK - 1)),
                            0, jnp.maximum(p_a - SCHUNK, 0))
                        kw = jnp.where(need, nkw, kw)
                        jw = jnp.where(need, (jlo // 8) * 8, jw)
                        cw = jnp.where(need, (cc // 128) * 128, cw)

                        @pl.when(need)
                        def _():
                            fetch_window(kw, jw, cw)

                        # Run boundaries for all window rows at once.
                        plane = win[k - kw]
                        r0v = jnp.sum(jnp.where(lane_w == cc - cw, plane,
                                                0), axis=1)
                        r1v = jnp.sum(jnp.where(lane_w == ce + 1 - cw,
                                                plane, 0), axis=1)
                        rr[:, 0] = r0v
                        rr[:, 1] = r1v

                        # Adaptive span merge: one contiguous run
                        # covering all rect rows when the inter-row gaps
                        # are small (gap refs are real triangles of this
                        # slice, so testing them is conservative-correct
                        # and packs panels full); per-row runs otherwise
                        # (a full span across Sponza-like wall rows costs
                        # more than the sparse panels it saves).
                        row_i = jax.lax.broadcasted_iota(
                            jnp.int32, (BWIN, 128), 0)[:, 0:1]
                        in_rect = ((row_i >= jlo - jw)
                                   & (row_i <= jhi - jw))
                        runs = jnp.sum(jnp.where(
                            in_rect, rr[:, 1:2] - rr[:, 0:1], 0))
                        r0s = rr[jlo - jw, 0]
                        r1s = rr[jhi - jw, 1]
                        span = r1s - r0s
                        merged = span <= jnp.maximum(runs * 2, 192)

                        def panels(r0, r1):
                            def chunk_body(i, _):
                                run_panel((r0 // RCHUNK + i) * RCHUNK)
                                return 0

                            nch = (r1 - (r0 // RCHUNK) * RCHUNK
                                   + (RCHUNK - 1)) // RCHUNK
                            jax.lax.fori_loop(0, nch, chunk_body, 0)

                        @pl.when(merged & (runs > 0))
                        def _():
                            panels(r0s, r1s)

                        @pl.when(~merged)
                        def _():
                            def row_body(j, _):
                                panels(rr[j - jw, 0], rr[j - jw, 1])
                                return 0

                            jax.lax.fori_loop(jlo, jhi + 1, row_body, 0)

                        return kw, jw, cw, jnp.int32(1)

                    return jax.lax.fori_loop(0, nrw, rw_body, kjc)

                return jax.lax.fori_loop(0, nseg, seg_body,
                                         (kw, jw, cw, has_win))

            kw, jw, cw, has_win = jax.lax.fori_loop(
                0, CHECK, one_slice, (kw, jw, cw, has_win))

            # Termination check, once per CHECK slices: entry t of the
            # next batch's first slice per ray. best_ref is reduced here
            # (not per panel) — panels only update the lane accumulators.
            best_ref[:] = jnp.min(acc_t[:], axis=1)
            kn = k0s + CHECK * step
            plane = lo_a + (jnp.where(step > 0, kn, kn + 1)
                            ).astype(jnp.float32) * cs_a
            t_entry = (plane - o_a) * inv_a
            if any_hit:
                # min with _BIG: unhit rays carry best == _BIG and camera
                # rays carry tmax == +inf; they are NOT done.
                done = best_ref[:] < jnp.minimum(tmax, _BIG)
            else:
                done = best_ref[:] <= t_entry
            act = alive & ~done & (t_entry < jnp.minimum(tmax, leave))
            n_act = jnp.sum(act.astype(jnp.int32))
            return kn, kw, jw, cw, has_win, n_act

        def slice_cond(state):
            k, _, _, _, _, n_act = state
            return (k >= 0) & (k < n_a) & (n_act > 0)

        n_live = jnp.sum(alive.astype(jnp.int32))
        jax.lax.while_loop(
            slice_cond, slice_body,
            (k0, jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
             n_live))

        # ------------------------------------------------------------------
        # Reduce accumulators: id/u/v at the winning lane.
        # ------------------------------------------------------------------
        bt = jnp.min(acc_t[:], axis=1)
        at_min = acc_t[:] == bt[:, None]
        idi = jax.lax.bitcast_convert_type(acc_id[:], jnp.int32)
        big_id = jnp.int32(2 ** 30)
        id_min = jnp.min(jnp.where(at_min & (idi >= 0), idi, big_id),
                         axis=1)
        sel = at_min & (idi == id_min[:, None])
        u_best = jnp.max(jnp.where(sel, acc_u[:], -_BIG), axis=1)
        v_best = jnp.max(jnp.where(sel, acc_v[:], -_BIG), axis=1)
        found = (bt < _BIG) & (id_min < big_id)
        out_ref[:, 0] = jnp.where(found, bt, _BIG)
        out_ref[:, 1] = jax.lax.bitcast_convert_type(
            jnp.where(found, id_min, -1), jnp.float32)
        out_ref[:, 2] = jnp.where(found, u_best, 0.0)
        out_ref[:, 3] = jnp.where(found, v_best, 0.0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("dims3", "any_hit", "interpret"))
def _trace_padded(xp, meta, tables, dims3, any_hit, interpret):
    """Run the kernel over pre-binned, TILE-padded rays. xp f32[Np, 16]."""
    (sx, qx, ix_), (sy, qy, iy_), (sz, qz, iz_) = tables
    n_pad = xp.shape[0]
    n_tiles = n_pad // TILE
    r_cap = qx.shape[1] // 4
    kernel = _make_kernel(dims3, r_cap, any_hit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 16), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # starts_x
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),  # refq_x
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),  # refid_x
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, 4), lambda i, m: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SCHUNK, BWIN, CWIN), jnp.int32),       # win
            pltpu.VMEM((BWIN, 128), jnp.int32),                # rr
            pltpu.VMEM((16, 4 * RCHUNK), jnp.float32),         # rq
            pltpu.VMEM((1, RCHUNK), jnp.float32),              # rid
            pltpu.VMEM((TILE, RCHUNK), jnp.float32),           # acc_t
            pltpu.VMEM((TILE, RCHUNK), jnp.float32),           # acc_id
            pltpu.VMEM((TILE, RCHUNK), jnp.float32),           # acc_u
            pltpu.VMEM((TILE, RCHUNK), jnp.float32),           # acc_v
            pltpu.VMEM((TILE,), jnp.float32),                  # best
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        grid_spec=grid_spec,
        # Panels + accumulators exceed the default 16M scoped-vmem limit;
        # the physical budget is larger and ~20M fits comfortably.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(meta, xp, sx, sy, sz, qx, qy, qz, ix_, iy_, iz_)


@functools.partial(jax.jit, static_argnames=("n_pad",))
def _bin_rays(x, n_pad):
    """Group rays by (major axis, sign) into TILE-aligned segments.

    Returns (xp f32[n_pad,16] padded/permuted rays, inv i32[n_pad] row ->
    original ray, or -1 for padding). Counting sort via masked cumsums —
    no device-wide sort (docs/ARCHITECTURE.md: sorts are not free)."""
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
    padded = -(-counts // TILE) * TILE
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    pos = offs[g] + ranks

    # Padding rows: a dead ray far outside the scene, pointing +x.
    dead = jnp.zeros((16,), jnp.float32)
    dead = dead.at[0].set(1.0).at[1].set(-1e30).at[4].set(1.0)
    xp = jnp.broadcast_to(dead, (n_pad, 16)).at[pos].set(x, mode="drop")
    inv = jnp.full((n_pad,), -1, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return xp, inv


@functools.partial(jax.jit, static_argnames=("n",))
def _unbin_hits(out, inv, n):
    """Scatter kernel rows back to original ray order."""
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


def trace_packet(grid: PacketGrid, rays: Rays, any_hit: bool = False,
                 interpret: bool = False) -> Hits:
    """Bin rays into coherent packets and trace them with the Pallas
    kernel. Ray order should be image-block/Morton coherent for narrow
    frusta (see core.camera.primary_rays block ordering)."""
    n = rays.count
    x = rays_to_x(rays.org, rays.dir, rays.tmin, rays.tmax)
    n_pad = (-(-n // TILE) + 6) * TILE
    xp, inv = _bin_rays(x, n_pad)
    ext = grid.bbox_hi - grid.bbox_lo
    css = []
    for a in range(3):
        da, db, dc = grid.dims3[a]
        b, c = (a + 1) % 3, (a + 2) % 3
        css.append(jnp.stack([ext[a] / da, ext[b] / db, ext[c] / dc]))
    meta = jnp.concatenate([grid.bbox_lo] + css
                           + [jnp.zeros((4,), jnp.float32)])
    tables = tuple(grid.axis_tables(a) for a in range(3))
    out = _trace_padded(xp, meta, tables, grid.dims3, any_hit, interpret)
    return _unbin_hits(out, inv, n)
