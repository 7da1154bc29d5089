"""Planned-sweep packet traversal — flagship TPU tracer, round 2.

Counterpart of the reference's traverse_grid hot loop (src/traverse.cu).
Round 1's lesson: anything scalar inside a Mosaic kernel runs at ~1
op/cycle and dominates; round 2's lessons (measured, see memory notes):
per-pair VPU math is the real cost once control flow is hoisted out, and
fixed-size 128-ref panels waste ~70% of their lanes on refs outside the
frustum rect. So the design hoists BOTH control flow and ref selection
out of the kernel:

1. **XLA planning (vectorized over ray tiles).** Rays are binned into
   TILE-sized packets by (major axis, sign), Morton/image coherent. Per
   round, each live tile advances one SLAB of S slices along its major
   axis; per-quarter frustum rects (pure interval arithmetic) turn into
   REF-level ranges via the build-time `rs` tables — two gathers per
   rect row, no device-wide scatters.

2. **In-kernel DMA gather (round 4).** Ref ranges round outward to
   48-ref UNITS — exactly (8, 128)-tile-aligned slices of the `cols`
   group-row table (6 refs x 20 coefficients + 8 pad lanes per row).
   The sweep kernel DMAs each block's 16 units straight from HBM into
   VMEM, double-buffered one block ahead, so the gathered stream is
   never materialized in HBM (the round-2/3 XLA gather wrote it out
   and read it back — a full extra round-trip), and blocks whose rays
   have already terminated skip the fetch entirely. Units pack into
   768-ref blocks per tile, (nearly) fully occupied with exactly the
   refs some ray of the tile might hit. (The XLA unit gather survives
   as the interpret-mode fallback for CPU tests.)

3. **Pallas sweep kernel (zero scalar control, static grid).** grid =
   (n_blocks,); one prefetched tile-id array drives the BlockSpecs: the
   rays' X matrix lives TRANSPOSED (rays on lanes) and G blocks are
   (128, 128) (tris on sublanes), so neither side needs an in-kernel
   relayout. The body is one dense exact-f32 Moller-Trumbore of
   TILE rays x 768 gathered tris on the VPU plus lane-accumulator
   updates; per-tile results flush when the block stream moves on.

4. **Device-side round loop.** The whole frame — every round's plan,
   gather, sweep, merge — is ONE jitted computation with ZERO
   device->host reads (this runtime only synchronizes honestly after a
   first D2H read; hot paths must not read back anyway). Rounds are
   statically unrolled; chunk launches sit behind lax.cond so empty
   rounds cost nothing; the block budget is a static capacity with an
   overflow flag checked once at the end of the frame.

Numerics: plain f32 VPU — exact parity with the oracle (bf16 MXU
DEFAULT flips ~1% of hits; 3-pass HIGH costs more than the VPU form).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Hits, Rays
from ..grid.packet import PacketGrid, rays_to_x
from .segment import expand_by_counts

_BIG = 3e38
_BIG_BITS = int(np.float32(3e38).view(np.int32))  # bit pattern of _BIG
_BIGID = 2 ** 30
_SUB = 4        # ray quarters per tile (tighter union rects)
_RMAX = 4       # c-trimmed row ranges per (tile, slice); taller rects
#                 fall back to one untrimmed multi-row tail range.
#                 Measured rects span ~2.7 rows on Sponza primaries, so 4
#                 slots cover almost all rects at half the rs-gather cost
#                 of 8 (plan was ~6 ms/round, half of it these gathers).
_GCHUNK = 1024   # blocks per gated gather piece (XLA-gather fallback)
_G = 6           # refs per group row (one 128-lane row of `cols`:
#                 6 x 20 coefficient floats + 8 zero pad lanes — the
#                 lane tile is 93.75% real data, and every 8-row
#                 gather UNIT is an exactly (8, 128)-aligned slice)
_GW = 128        # group-row lane width
_U = int(os.environ.get("HAGRID_SWEEP_U", "4"))
#                 Group rows per GATHER UNIT (1, 2, 4 or 8; rows of
#                 `cols` are (1, 128)-tiled so any row count DMAs
#                 cleanly). The round-4 kernel DMAs units straight
#                 from `cols` in HBM (one contiguous 512B*_U slice);
#                 the XLA-gather fallback gathers the same units as
#                 rows of cols_u. Ranges round outward to 6*_U-ref
#                 units — the round-out rows are real refs of the same
#                 layout (conservative) or zero pad rows (never hit).
#                 Smaller units waste fewer round-out refs (the ranges
#                 are short: mean ~2.8 48-ref units on Sponza
#                 primaries) but cost more DMA issues per block.
_NGROUPS = 7       # (axis, sign) groups + 1 dead group
_NGROUPS_FINE = 25  # (axis, sign, minor-sign quadrant) groups + dead
_UPB = 128 // _U  # gather units per 768-ref block
_BREF = 128 * _G  # refs per block
# Blocks per pallas_call, sized so the prefetched unit-index array
# stays within SMEM (~256KB of gidx per call regardless of _U).
_CHUNK = 4096 * _U // 8


# ----------------------------------------------------------------------
# Kernel: dense MT of one gathered 128-ref block vs one ray tile.
# Layout: rays on LANES (xT (16, tile) blocks), tris on SUBLANES
# (G (128, 16) blocks) — both sides broadcast without relayouts.
# ----------------------------------------------------------------------

def _acc_init(xt_ref, acc_t, acc_id, acc_u, acc_v, acc_bt, tile):
    # Seed the t accumulator with the tile's prior-round best
    # (xt row 14; -BIG for dead lanes) so the early-out below
    # also fires for work preceding already-found hits. Seeds
    # carry id -1, so they can never flush as hits themselves.
    best = xt_ref[14:15, :]
    acc_t[:] = jnp.broadcast_to(best, (128, tile))
    acc_id[:] = jnp.full((128, tile), -1.0, jnp.float32)
    acc_u[:] = jnp.zeros((128, tile), jnp.float32)
    acc_v[:] = jnp.zeros((128, tile), jnp.float32)
    acc_bt[0:1, :] = best


def _mt_update(g_ref, xt_ref, acc_t, acc_id, acc_u, acc_v, acc_bt,
               tile, any_hit):
    ox = xt_ref[1:2, :]
    oy = xt_ref[2:3, :]
    oz = xt_ref[3:4, :]
    dx = xt_ref[4:5, :]
    dy = xt_ref[5:6, :]
    dz = xt_ref[6:7, :]
    mx = xt_ref[7:8, :]
    my = xt_ref[8:9, :]
    mz = xt_ref[9:10, :]
    tmin = xt_ref[12:13, :]
    if any_hit:
        tmax = xt_ref[13:14, :]
    # The block holds _G interleaved 128-tri sets (one per ref
    # position within the gathered 6-ref group rows); each set
    # intersects the whole tile via the PRECOMPUTED linear form
    # (grid/packet.py module docstring): det, t*det, u*det,
    # v*det are dots of per-tri coefficient rows with
    # (o, d, m) — ~38 VPU ops/pair vs ~65 for classic MT.
    for s in range(_G):
        o = s * 20
        n0 = g_ref[:, o + 0:o + 1]
        n1 = g_ref[:, o + 1:o + 2]
        n2 = g_ref[:, o + 2:o + 3]
        b0 = g_ref[:, o + 3:o + 4]
        b1 = g_ref[:, o + 4:o + 5]
        b2 = g_ref[:, o + 5:o + 6]
        c0 = g_ref[:, o + 6:o + 7]
        c1 = g_ref[:, o + 7:o + 8]
        c2 = g_ref[:, o + 8:o + 9]
        d0 = g_ref[:, o + 9:o + 10]
        d1 = g_ref[:, o + 10:o + 11]
        d2 = g_ref[:, o + 11:o + 12]
        e0 = g_ref[:, o + 12:o + 13]
        e1 = g_ref[:, o + 13:o + 14]
        e2 = g_ref[:, o + 14:o + 15]
        f = g_ref[:, o + 15:o + 16]
        ids = g_ref[:, o + 16:o + 17]
        det = dx * n0 + dy * n1 + dz * n2      # = -det_MT
        tt = f - (ox * n0 + oy * n1 + oz * n2)
        uu = (mx * b0 + my * b1 + mz * b2
              + dx * c0 + dy * c1 + dz * c2)
        vv = (mx * d0 + my * d1 + mz * d2
              + dx * e0 + dy * e1 + dz * e2)
        inv = 1.0 / det  # det = 0 -> inf/NaN, self-filtered
        t = tt * inv
        u = uu * inv
        v = vv * inv
        # min-form barycentric test; NaN/inf compare false. The
        # eps guard keeps near-parallel slivers from phantom
        # far hits.
        edge = jnp.minimum(jnp.minimum(u, v), 1.0 - (u + v))
        # Closest-hit seeds acc_t with min(best, tmax) (see
        # _frame), so t < acc_t subsumes t < tmax; any-hit
        # keeps the explicit test (its seed must stay the raw
        # best for the found-a-hit done threshold).
        ok = ((edge >= 0.0) & (jnp.abs(det) > 1e-12)
              & (t > tmin))
        if any_hit:
            ok = ok & (t < tmax)
        better = ok & (t < acc_t[:])
        acc_t[:] = jnp.where(better, t, acc_t[:])
        acc_id[:] = jnp.where(
            better, jnp.broadcast_to(ids, (128, tile)),
            acc_id[:])
        acc_u[:] = jnp.where(better, u, acc_u[:])
        acc_v[:] = jnp.where(better, v, acc_v[:])
    acc_bt[0:1, :] = jnp.min(acc_t[:], axis=0, keepdims=True)


def _flush(out_ref, acc_t, acc_id, acc_u, acc_v):
    bt = jnp.min(acc_t[:], axis=0)
    at_min = acc_t[:] == bt[None, :]
    # Ids are float VALUES (exact below 2^24; bit patterns get
    # denormal-flushed by float ops — see grid/packet.py).
    idi = acc_id[:].astype(jnp.int32)
    id_min = jnp.min(jnp.where(at_min & (idi >= 0), idi,
                               _BIGID), axis=0)
    sel = at_min & (idi == id_min[None, :])
    u_best = jnp.max(jnp.where(sel, acc_u[:], -_BIG), axis=0)
    v_best = jnp.max(jnp.where(sel, acc_v[:], -_BIG), axis=0)
    found = (bt < _BIG) & (id_min < _BIGID)
    out_ref[0, :] = jnp.where(found, bt, _BIG)
    out_ref[1, :] = jnp.where(found, id_min,
                              -1).astype(jnp.float32)
    out_ref[2, :] = jnp.where(found, u_best, 0.0)
    out_ref[3, :] = jnp.where(found, v_best, 0.0)


def _make_kernel(tile: int, nt: int, any_hit: bool):
    def kernel(tile_of, tminb, xt_ref, g_ref, out_ref,
               acc_t, acc_id, acc_u, acc_v, acc_bt):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        t_cur = tile_of[i]
        first = (i == 0) | (t_cur != tile_of[jnp.maximum(i - 1, 0)])
        last = (i == n - 1) | (t_cur != tile_of[jnp.minimum(i + 1,
                                                            n - 1)])
        live = t_cur < nt

        @pl.when(first & live)
        def _():
            _acc_init(xt_ref, acc_t, acc_id, acc_u, acc_v, acc_bt, tile)

        # In-kernel early termination (the reference hot loop's
        # `hit.t <= t_exit` break, at block granularity): every ref in
        # this block lies in a slice whose tile-entry t is >= thr, so
        # if every ray's running best is already <= thr nothing here
        # can improve — skip the whole MT body. Compared in int space:
        # both sides are bit patterns of non-negative f32, where int
        # order == float order.
        bt_bits = jax.lax.bitcast_convert_type(acc_bt[0:1, :],
                                               jnp.int32)
        done = jnp.all(bt_bits <= tminb[i])

        @pl.when(live & ~done)
        def _():
            _mt_update(g_ref, xt_ref, acc_t, acc_id, acc_u, acc_v,
                       acc_bt, tile, any_hit)

        @pl.when(last & live)
        def _():
            _flush(out_ref, acc_t, acc_id, acc_u, acc_v)

    return kernel


def _make_kernel_dma(tile: int, nt: int, any_hit: bool):
    """DMA-gather variant: the kernel fetches its 16 gather units
    straight from the cols table in HBM (double-buffered, issued one
    block ahead), instead of sweeping a pre-gathered stream. This
    removes the XLA gather stage entirely — the gathered stream is
    never materialized in HBM (saves a full write+read round-trip of
    ~40KB/block) — and blocks whose rays have already terminated skip
    the fetch as well as the math: the issue for block i+1 is gated on
    the SAME early-out predicate, evaluated with the accumulator state
    after block i (acc_bt only decreases, so a skip decided early
    remains valid at processing time)."""
    def kernel(tile_of, tminb, gidx, xt_ref, cols_hbm, out_ref,
               gbuf0, gbuf1, sem0, sem1, issued,
               acc_t, acc_id, acc_u, acc_v, acc_bt):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        t_cur = tile_of[i]
        first = (i == 0) | (t_cur != tile_of[jnp.maximum(i - 1, 0)])
        last = (i == n - 1) | (t_cur != tile_of[jnp.minimum(i + 1,
                                                            n - 1)])
        live = t_cur < nt

        def dma(b, gb, sm, u):
            idx = gidx[b * _UPB + u]
            return pltpu.make_async_copy(
                cols_hbm.at[pl.ds(idx * _U, _U), :],
                gb.at[pl.ds(u * _U, _U), :],
                sm.at[u])

        def issue(b, gb, sm):
            for u in range(_UPB):
                dma(b, gb, sm, u).start()

        def wait(b, gb, sm):
            for u in range(_UPB):
                dma(b, gb, sm, u).wait()

        slots = ((gbuf0, sem0), (gbuf1, sem1))

        # Warm-up: issue block 0 into slot 0 (no done-state yet).
        @pl.when(i == 0)
        def _():
            issued[0] = jnp.where(live, 1, 0)
            issued[1] = jnp.int32(0)

            @pl.when(live)
            def _():
                issue(0, gbuf0, sem0)

        @pl.when(first & live)
        def _():
            _acc_init(xt_ref, acc_t, acc_id, acc_u, acc_v, acc_bt, tile)

        bt_bits = jax.lax.bitcast_convert_type(acc_bt[0:1, :],
                                               jnp.int32)
        done = jnp.all(bt_bits <= tminb[i])

        slot = jax.lax.rem(i, 2)
        for s, (gb, sm) in enumerate(slots):
            was_issued = issued[s] == 1

            # Drain the slot's semaphores before it can be re-issued
            # (two steps later) even when the MT body is skipped.
            @pl.when((slot == s) & was_issued)
            def _(gb=gb, sm=sm):
                wait(i, gb, sm)

            @pl.when((slot == s) & was_issued & live & ~done)
            def _(gb=gb, sm=sm):
                _mt_update(gb, xt_ref, acc_t, acc_id, acc_u, acc_v,
                           acc_bt, tile, any_hit)

        # Issue block i+1 one step ahead. Gate on its own early-out:
        # same tile + all lanes' running best already at or below its
        # threshold -> its DMA (and MT) can never matter. acc_bt is
        # monotone non-increasing, so the skip stays valid.
        nxt = jnp.minimum(i + 1, n - 1)
        t_nxt = tile_of[nxt]
        live_nxt = t_nxt < nt
        bt2 = jax.lax.bitcast_convert_type(acc_bt[0:1, :], jnp.int32)
        nxt_done = (t_nxt == t_cur) & live & jnp.all(bt2 <= tminb[nxt])
        do_issue = (i + 1 < n) & live_nxt & ~nxt_done
        nslot = jax.lax.rem(i + 1, 2)
        for s, (gb, sm) in enumerate(slots):
            @pl.when((nslot == s) & (i + 1 < n))
            def _(gb=gb, sm=sm, s=s):
                issued[s] = jnp.where(do_issue, 1, 0)

                @pl.when(do_issue)
                def _():
                    issue(i + 1, gb, sm)

        @pl.when(last & live)
        def _():
            _flush(out_ref, acc_t, acc_id, acc_u, acc_v)

    return kernel


def _sweep_dma(xt_ext, cols, gidx, tile_of, tminb, tile, any_hit):
    """One block-chunk sweep with in-kernel DMA gather (TPU only).
    cols stays in HBM; each block's 16 aligned (8, 128) units are
    DMA'd into VMEM one block ahead of the MT body."""
    n_cols = xt_ext.shape[1]
    nt = n_cols // tile - 1
    grid = (tile_of.shape[0],)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, tile), lambda i, t, tb, gi: (0, t[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda i, t, tb, gi: (0, t[i]),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((128, _GW), jnp.float32),
            pltpu.VMEM((128, _GW), jnp.float32),
            pltpu.SemaphoreType.DMA((_UPB,)),
            pltpu.SemaphoreType.DMA((_UPB,)),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((128, tile), jnp.float32),
            pltpu.VMEM((128, tile), jnp.float32),
            pltpu.VMEM((128, tile), jnp.float32),
            pltpu.VMEM((128, tile), jnp.float32),
            pltpu.VMEM((8, tile), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_kernel_dma(tile, nt, any_hit),
        out_shape=jax.ShapeDtypeStruct((8, n_cols), jnp.float32),
        grid_spec=grid_spec,
    )(tile_of, tminb, gidx, xt_ext, cols)


def _sweep(xt_ext, g_round, tile_of, tminb, boff, tile, any_hit,
           interpret):
    """One block-chunk sweep over a STATIC grid (a dynamic Mosaic grid
    disables the block pipeline: measured 15us/item vs 1.8us). Dead
    blocks (tile_of == nt) revisit the dummy blocks and skip all vector
    work; live blocks whose rays all terminated before the block's
    slice (tminb) skip the MT body."""
    n_cols = xt_ext.shape[1]
    nt = n_cols // tile - 1
    grid = (tile_of.shape[0],)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, tile), lambda i, t, tb: (0, t[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, _GW), lambda i, t, tb: (i + boff, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda i, t, tb: (0, t[i]),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((128, tile), jnp.float32),
            pltpu.VMEM((128, tile), jnp.float32),
            pltpu.VMEM((128, tile), jnp.float32),
            pltpu.VMEM((128, tile), jnp.float32),
            pltpu.VMEM((8, tile), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_kernel(tile, nt, any_hit),
        out_shape=jax.ShapeDtypeStruct((8, n_cols), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_of, tminb, xt_ext, g_round)


# ----------------------------------------------------------------------
# Binning and per-tile precompute (all XLA)
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_pad", "tile", "fine"))
def _bin_rays(org, dir, tmin, tmax, n_pad, tile, fine=False):
    """Group rays by (major axis, sign) into tile-aligned segments via
    masked cumsums (stable counting sort; no device-wide lax.sort).
    Returns (xp_ext (rows, 16), xt_ext (16, rows), inv) with a trailing
    all-dead dummy tile; inv maps row -> original ray (-1 padding).

    Masked-dead rays (tmax <= 0) go to a final dead group so live tiles
    stay densely packed — sort-based compaction with static shapes.
    Within groups the stable sort PRESERVES caller order, which for
    camera-derived secondary waves carries image-block origin locality
    finer than any scene-space code: re-ordering an AO wave by
    (direction octant, 7-bit origin Morton) was measured to cost +33%
    block demand (Sponza 256^2 wave-1, plan-only probe), so no Morton
    pass here; ops/sortrays stays available for caller-side sorting of
    genuinely orderless waves.

    fine=True: subdivide each (axis, sign) group by the SIGNS of the
    two minor direction components (24 live groups + dead). Hemisphere-
    sampled waves (AO, diffuse bounces) have tile direction cones
    spanning the whole axis quadrant, so their frustum rects cover most
    of each slice's cross-section (measured 173k-block demand on a
    Sponza AO wave = 35x primaries); quartering the cone trades a ~2x
    wider per-quarter origin box (the subgroup's rays come from 4x the
    image area) for a 4x narrower direction fan."""
    x = rays_to_x(org, dir, tmin, tmax)
    n = x.shape[0]
    d = x[:, 4:7]
    ad = jnp.abs(d)
    axis = jnp.where(ad[:, 0] >= jnp.maximum(ad[:, 1], ad[:, 2]), 0,
                     jnp.where(ad[:, 1] >= ad[:, 2], 1, 2))
    sign = (jnp.take_along_axis(d, axis[:, None], axis=1)[:, 0]
            < 0).astype(jnp.int32)
    g6 = axis * 2 + sign
    if fine:
        d1 = jnp.take_along_axis(d, ((axis + 1) % 3)[:, None],
                                 axis=1)[:, 0]
        d2 = jnp.take_along_axis(d, ((axis + 2) % 3)[:, None],
                                 axis=1)[:, 0]
        sub = (d1 < 0).astype(jnp.int32) * 2 + (d2 < 0).astype(jnp.int32)
        glive, ng = g6 * 4 + sub, _NGROUPS_FINE
    else:
        glive, ng = g6, _NGROUPS
    g = jnp.where(x[:, 13] > 0, glive, ng - 1)

    ranks = jnp.zeros((n,), jnp.int32)
    counts = []
    for k in range(ng):
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
    # 64MB row scatter lowers poorly). inv == -1 rows -> the dead ray.
    inv = jnp.full((n_pad + tile,), -1, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    dead = jnp.zeros((16,), jnp.float32)
    dead = dead.at[0].set(1.0).at[1].set(-1e30).at[4].set(1.0)
    xp_ext = jnp.where((inv >= 0)[:, None],
                       x[jnp.maximum(inv, 0)], dead[None, :])
    return xp_ext, xp_ext.T, inv[:n_pad]


@functools.partial(jax.jit, static_argnames=("n_pad", "tile"))
def _pad_coherent(org, dir, tmin, tmax, n_pad, tile):
    """Bin-free packet layout for rays that are already coherent (e.g.
    block-Morton primaries): keep ray order, pad with dead rays, append
    the all-dead dummy tile. Skips _bin_rays' 1M-row permutation gather
    (~29 ms/frame measured). Tiles need not be (axis, sign)-pure: the
    per-tile axis comes from ray 0 and stray rays only widen that
    tile's rects (correct, just less efficient), so callers should only
    use this for camera-coherent waves."""
    x = rays_to_x(org, dir, tmin, tmax)
    n = x.shape[0]
    dead = jnp.zeros((16,), jnp.float32)
    dead = dead.at[0].set(1.0).at[1].set(-1e30).at[4].set(1.0)
    pad = jnp.broadcast_to(dead, (n_pad + tile - n, 16))
    xp_ext = jnp.concatenate([x, pad], axis=0)
    return xp_ext, xp_ext.T


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


def _precompute(xp, cs_tab, n_tab, lo_tab, bbox_lo, bbox_hi, tile,
                planes):
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
    n_a = n_tab[axis, 0]

    # Entry slice from the packet's entry points: slice k spans
    # [P_k, P_{k+1}) of the per-layout (possibly non-uniform) plane
    # table, so the containing slice = count of interior planes <= pos.
    pa_in = o_a + enter * d_a
    pa_sel = jnp.where(alive, pa_in, jnp.where(step[:, None] > 0,
                                               _BIG, -_BIG))
    front = jnp.where(step > 0, jnp.min(pa_sel, axis=1),
                      jnp.max(pa_sel, axis=1))
    p_tile = planes[axis]                       # (nt, PMAX)
    pidx = jnp.arange(planes.shape[1], dtype=jnp.int32)
    interior = (pidx[None, :] >= 1) & (pidx[None, :] <= n_a[:, None] - 1)
    k0 = jnp.sum(((p_tile <= front[:, None]) & interior).astype(
        jnp.int32), axis=1)
    k0 = jnp.clip(k0, 0, n_a - 1)

    per_ray = dict(o_a=o_a, o_b=o_b, o_c=o_c, d_a=d_a, d_b=d_b, d_c=d_c,
                   inv_a=inv_a, enter=enter, leave=leave, alive=alive,
                   tmax=tmax)
    per_tile = dict(axis=axis, step=step, k0=k0, p_tile=p_tile)
    return per_ray, per_tile


# ----------------------------------------------------------------------
# Round planning (all XLA, inside the frame jit)
# ----------------------------------------------------------------------

def _plan_dense(per_ray, per_tile, cs_tab, n_tab, lo_tab, ka,
                best_t, dims3, slab, any_hit):
    """Dense per-(tile, slice) phase shared by the dense slot planner
    (_plan) and the compacted row-stream planner (_plan_items2):
    per-tile axis tables, per-quarter frustum bounds, per-slice
    t-windows and row rects. Reductions and elementwise math only —
    no device-wide gathers or scatters."""
    axis = per_tile["axis"]
    step = per_tile["step"]
    nt = axis.shape[0]
    cs_b = cs_tab[axis, 1]
    cs_c = cs_tab[axis, 2]
    lo_b = lo_tab[axis, 1]
    lo_c = lo_tab[axis, 2]
    n_a = n_tab[axis, 0]
    n_b = n_tab[axis, 1]
    n_c = n_tab[axis, 2]

    # Ray liveness: best hit precedes the slab's entry plane -> done.
    # Plane positions come from the per-layout table (non-uniform
    # slice spacing; see grid/packet._slice_planes).
    p_tile = per_tile["p_tile"]                         # (nt, PMAX)
    plane0 = jnp.take_along_axis(
        p_tile, jnp.clip(ka + (step < 0), 0, n_a)[:, None],
        axis=1)[:, 0]
    t_entry = (plane0[:, None] - per_ray["o_a"]) * per_ray["inv_a"]
    lim = jnp.minimum(per_ray["tmax"], per_ray["leave"])
    if any_hit:
        done = best_t < jnp.minimum(per_ray["tmax"], _BIG)
    else:
        done = best_t <= t_entry
    live = per_ray["alive"] & ~done & (t_entry < lim) \
        & (ka[:, None] >= 0) & (ka[:, None] < n_a[:, None])

    # Frustum bounds per QUARTER tile (rays are Morton-ordered, so
    # quarters are spatially coherent); the rect is the live union —
    # quarters that terminate early stop widening it.
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

    # Slab slices: (nt, S); per-quarter per-slice t range and rect.
    ks = ka[:, None] + step[:, None] * jnp.arange(slab, dtype=jnp.int32)
    k_ok = (ks >= 0) & (ks < n_a[:, None])
    ks_cl = jnp.clip(ks, 0, n_a[:, None])
    pl0 = jnp.take_along_axis(p_tile, ks_cl, axis=1)   # (nt, S)
    pl1 = jnp.take_along_axis(
        p_tile, jnp.minimum(ks_cl + 1, n_a[:, None]), axis=1)

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
    rect_okq = t_ok & k_ok[:, None, :]                  # (nt,SUB,S)
    # Full-tile row range = union over live quarters.
    ibig = jnp.int32(2 ** 20)
    b0 = jnp.min(jnp.where(rect_okq, b0q, ibig), axis=1)   # (nt,S)
    b1 = jnp.max(jnp.where(rect_okq, b1q, -1), axis=1)
    rect_ok = jnp.any(rect_okq, axis=1)
    b0 = jnp.where(rect_ok, b0, 0)
    b1 = jnp.where(rect_ok, b1, 0)

    # rowinfo flat indexing: per-layout row-index base + per-tile
    # strides (the rs offsets themselves live IN rowinfo — rows are
    # ragged under per-row column refinement, grid/packet.py).
    qbase_list = []
    off = 0
    for a in range(3):
        da_, db_, _ = dims3[a]
        qbase_list.append(off)
        off += da_ * db_
    qbase = jnp.array(qbase_list, jnp.int32)[axis]          # (nt,)
    k_cl = jnp.clip(ks, 0, n_a[:, None] - 1)

    return dict(
        axis=axis, step=step, nt=nt, cs_b=cs_b, cs_c=cs_c, lo_b=lo_b,
        lo_c=lo_c, n_a=n_a, n_b=n_b, n_c=n_c, qbase=qbase,
        ob_lo=ob_lo, ob_hi=ob_hi, oc_lo=oc_lo, oc_hi=oc_hi,
        db_lo=db_lo, db_hi=db_hi, dc_lo=dc_lo, dc_hi=dc_hi,
        tl=tl, th=th, t_ok=t_ok, rect_okq=rect_okq, rect_ok=rect_ok,
        b0q=b0q, b1q=b1q, b0=b0, b1=b1, ks=ks, k_cl=k_cl)


def _plan(per_ray, per_tile, cs_tab, n_tab, lo_tab, rs, rowinfo, ka,
          best_t, dims3, slab, any_hit, rmax=_RMAX):
    """One slab's plan, DENSE slot form: per-tile frustum rect per
    slice, turned into REF-level ranges via the rs tables (2 gathers
    per rect row). Returns (range_start, range_count, thr_bits)
    flattened over (tile, slice, rmax row slots + 1 tail slot);
    thr_bits is the i32 bit pattern of the slice's tile-entry t (the
    kernel's early-out threshold: no ref of the slot can hit earlier
    than it). Cost scales with nt*S*(rmax+1) SLOTS, live or not — the
    right trade for coherent waves (few live rows, tiny slot space);
    incoherent waves use _plan_items2.
    """
    D = _plan_dense(per_ray, per_tile, cs_tab, n_tab, lo_tab, ka,
                    best_t, dims3, slab, any_hit)
    nt = D["nt"]
    cs_b, cs_c = D["cs_b"], D["cs_c"]
    lo_b, lo_c = D["lo_b"], D["lo_c"]
    n_a, n_b, n_c = D["n_a"], D["n_b"], D["n_c"]
    ob_lo, ob_hi = D["ob_lo"], D["ob_hi"]
    oc_lo, oc_hi = D["oc_lo"], D["oc_hi"]
    db_lo, db_hi = D["db_lo"], D["db_hi"]
    dc_lo, dc_hi = D["dc_lo"], D["dc_hi"]
    tl, th = D["tl"], D["th"]
    rect_okq, rect_ok = D["rect_okq"], D["rect_ok"]
    b0q, b1q, b0, b1 = D["b0q"], D["b1q"], D["b0"], D["b1"]
    ks, k_cl = D["ks"], D["k_cl"]
    qbase = D["qbase"]
    ibig = jnp.int32(2 ** 20)

    # Per-ROW column trim (the big pair cut): the frustum sweeps
    # diagonally through the (row, col) cross-section, so a slice-wide
    # [c0, c1] rect overcovers every row. For each of the _RMAX row
    # slots, restrict each quarter's slice t-interval to the t's where
    # some ray is inside that row's b-band (outer interval hull; when a
    # quarter's d_b interval straddles 0 the band time is unbounded and
    # the trim falls back to the slice interval), then derive the
    # column interval from the restricted t's. Measured on Sponza
    # primaries this cuts gathered refs ~=1.4x vs the slice-wide rect.
    rr = jnp.arange(rmax, dtype=jnp.int32)
    j_r = b0[:, :, None] + rr[None, None, :]                # (nt,S,R)
    db_pos = db_lo > 1e-30
    db_neg = db_hi < -1e-30
    db_ok = db_pos | db_neg                                  # (nt,SUB)
    safe_db_lo = jnp.where(db_ok, db_lo, 1.0)
    safe_db_hi = jnp.where(db_ok, db_hi, 1.0)
    idb_a = 1.0 / safe_db_lo
    idb_b = 1.0 / safe_db_hi
    # Broadcast shapes: quarter bounds (nt,SUB,1,1), slice t (nt,SUB,
    # S,1), rows (nt,1,S,R) -> all (nt,SUB,S,R).
    wb0 = (lo_b[:, None, None, None]
           + j_r[:, None, :, :].astype(jnp.float32)
           * cs_b[:, None, None, None])
    wb1 = wb0 + cs_b[:, None, None, None]
    nlo0 = wb0 - ob_hi[:, :, None, None]
    nhi0 = wb0 - ob_lo[:, :, None, None]
    nlo1 = wb1 - ob_hi[:, :, None, None]
    nhi1 = wb1 - ob_lo[:, :, None, None]
    ia = idb_a[:, :, None, None]
    ib = idb_b[:, :, None, None]

    def hull4(na, nb):
        p0, p1 = na * ia, na * ib
        p2, p3 = nb * ia, nb * ib
        return (jnp.minimum(jnp.minimum(p0, p1), jnp.minimum(p2, p3)),
                jnp.maximum(jnp.maximum(p0, p1), jnp.maximum(p2, p3)))

    e0_lo, e0_hi = hull4(nlo0, nhi0)     # crossing times of band lo
    e1_lo, e1_hi = hull4(nlo1, nhi1)     # crossing times of band hi
    tb_lo = jnp.minimum(e0_lo, e1_lo)
    tb_hi = jnp.maximum(e0_hi, e1_hi)
    dbok4 = db_ok[:, :, None, None]
    tj_lo = jnp.where(dbok4, jnp.maximum(tl[:, :, :, None], tb_lo),
                      tl[:, :, :, None])
    tj_hi = jnp.where(dbok4, jnp.minimum(th[:, :, :, None], tb_hi),
                      th[:, :, :, None])
    row_okq = (rect_okq[:, :, :, None] & (tj_lo <= tj_hi)
               & (j_r[:, None, :, :] <= b1q[:, :, :, None])
               & (j_r[:, None, :, :] >= b0q[:, :, :, None]))
    # Column interval of each quarter within the row's t window.
    x00 = tj_lo * dc_lo[:, :, None, None]
    x01 = tj_lo * dc_hi[:, :, None, None]
    x10 = tj_hi * dc_lo[:, :, None, None]
    x11 = tj_hi * dc_hi[:, :, None, None]
    vlo = oc_lo[:, :, None, None] + jnp.minimum(
        jnp.minimum(x00, x01), jnp.minimum(x10, x11))
    vhi = oc_hi[:, :, None, None] + jnp.maximum(
        jnp.maximum(x00, x01), jnp.maximum(x10, x11))
    # Per-row rowinfo (ragged rs offset + column multiplier — the
    # per-row refinement of grid/packet.py): one (nt, S, R) gather.
    j_cl = jnp.minimum(j_r, n_b[:, None, None] - 1)
    ri = rowinfo[qbase[:, None, None]
                 + k_cl[:, :, None] * n_b[:, None, None] + j_cl]
    roff = ri & 0x0FFFFFFF
    lgm = (ri >> 28)[:, None, :, :]                         # (nt,1,S,R)
    ics = (1.0 / cs_c)[:, None, None, None] * jnp.exp2(
        lgm.astype(jnp.float32))
    lo4 = lo_c[:, None, None, None]
    ncl = (n_c[:, None, None, None] << lgm) - 1
    c0q_r = jnp.clip(((vlo - lo4) * ics).astype(jnp.int32), 0, ncl)
    c1q_r = jnp.clip(((vhi - lo4) * ics).astype(jnp.int32), 0, ncl)
    c0_r = jnp.min(jnp.where(row_okq, c0q_r, ibig), axis=1)  # (nt,S,R)
    c1_r = jnp.max(jnp.where(row_okq, c1q_r, -1), axis=1)
    row_any = jnp.any(row_okq, axis=1)
    c0_r = jnp.where(row_any, c0_r, 0)
    c1_r = jnp.where(row_any, c1_r, -1)  # empty range when uncovered

    # Per-row c-trimmed ranges + untrimmed multi-row tail.
    row_ok = (j_r <= b1[:, :, None]) & rect_ok[:, :, None] & row_any
    g1 = rs[roff + c0_r]
    g2 = rs[roff + jnp.maximum(c1_r, 0) + 1]

    has_tail = rect_ok & (b1 - b0 + 1 > rmax)
    jt = jnp.minimum(b0 + rmax, n_b[:, None] - 1)
    ri_t = rowinfo[qbase[:, None] + k_cl * n_b[:, None] + jt]
    ri_b = rowinfo[qbase[:, None] + k_cl * n_b[:, None] + b1]
    t1 = rs[ri_t & 0x0FFFFFFF]
    t2 = rs[(ri_b & 0x0FFFFFFF) + (n_c[:, None] << (ri_b >> 28))]

    # Emit in GATHER UNITS (32 refs): round the ref range outward — the
    # extra refs at each end are real triangles of the same layout or
    # zero pad rows (conservative-correct; layout offsets in rs are
    # 768-multiples so units never straddle layouts).
    refs_u = _G * _U
    lo_r = jnp.concatenate([g1, t1[:, :, None]], axis=2)
    hi_r = jnp.concatenate([g2, t2[:, :, None]], axis=2)
    lo_g = lo_r // refs_u
    hi_g = -(-hi_r // refs_u)
    ok3 = jnp.concatenate([row_ok, has_tail[:, :, None]], axis=2)
    valid = ok3 & (hi_r > lo_r)
    # Boundary-unit dedup: a slice's slots (rows ascending, then the
    # tail) are DISJOINT ascending ref spans, so their unit round-outs
    # can only overlap by the single unit shared at each boundary.
    # Clamping each slot's start unit to the running max end of the
    # slice's earlier slots drops exactly those double-gathered units
    # (the dropped unit is always fully covered by the earlier slot's
    # emission — conservative-correct). Measured: the per-row column
    # trim makes ranges short (mean 2.8 units), so boundary units are
    # a real fraction of the stream.
    hi_m = jnp.where(valid, hi_g, 0)
    run = jnp.zeros(hi_m.shape[:2], hi_m.dtype)
    lo_cl = []
    for r in range(rmax + 1):
        lo_cl.append(jnp.maximum(lo_g[:, :, r], run))
        run = jnp.maximum(run, hi_m[:, :, r])
    lo_g = jnp.stack(lo_cl, axis=2)
    cnt_g = jnp.where(valid, jnp.maximum(hi_g - lo_g, 0), 0)

    # Early-out thresholds: closest-hit slots can't improve a ray once
    # its best <= the slot's tile-entry t (>= 0, so int bit order ==
    # float order). Row slots use the row-restricted entry time tj_lo
    # (tighter than the slice entry); the tail slot uses the slice
    # entry. Any-hit is done the moment any hit exists: threshold =
    # largest float < _BIG.
    if any_hit:
        thr = jnp.full(cnt_g.shape, _BIG_BITS - 1, jnp.int32)
    else:
        t_thr = jnp.min(jnp.where(rect_okq, tl, _BIG), axis=1)  # (nt,S)
        t_thr_r = jnp.min(jnp.where(row_okq, tj_lo, _BIG),
                          axis=1)                             # (nt,S,R)
        t_all = jnp.concatenate([t_thr_r, t_thr[:, :, None]], axis=2)
        # Threshold safety for shared boundary units: the running-max
        # clamp above hands a later slot's first unit to an EARLIER
        # slot's emission, so each slot's threshold must lower-bound
        # every later valid slot of its slice whose refs it may carry
        # — a suffix-min across the slot axis. No-op when tj_lo
        # ascends with j (single-quarter/coherent tiles); mixed-sign
        # tiles lose a few skips, never hits.
        t_all = jnp.where(valid, t_all, _BIG)
        t_all = jax.lax.cummin(t_all[:, :, ::-1], axis=2)[:, :, ::-1]
        thr = jax.lax.bitcast_convert_type(t_all, jnp.int32)
    return lo_g.reshape(-1), cnt_g.reshape(-1), thr.reshape(-1)


def _bits(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _fbits(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _plan_items2(per_ray, per_tile, cs_tab, n_tab, lo_tab, rs, rowinfo,
                 ka, best_t, dims3, slab, any_hit, rowcap, bcap,
                 dead_idx):
    """Compacted row-stream planner + unit packer (round 4).

    The dense slot planner's gathers and item streams scale with
    nt * S * (rmax + 1) SLOTS whether rows are live or not. Coherent
    primaries live happily in that regime (tiny slot space, ~8% live),
    but incoherent waves need BOTH many trimmed rows (tall rects — the
    untrimmed tail carried most of their demand) and small tiles, which
    inflate the dense slot space by two orders of magnitude. This path:

    1. dense phase (_plan_dense): per-(tile, slice) rects — cheap
       elementwise math, no gathers;
    2. expands exactly the LIVE rect rows into a static row stream
       (`rowcap` capacity, overflow-flagged) via scatter+cumsum;
    3. gathers ONE packed 64-lane feature row per row item and derives
       the per-quarter column trim for EVERY row (no untrimmed tail);
    4. packs gather units block-by-block from the compact stream (the
       roff/thr forward-fill scatters are rowcap-long instead of
       slot-space-long).

    Returns (gidx, tile_of, tminb, n_blocks, demand_units, row_ovf).
    Slot order is (tile, slice-march, row-ascending), so consecutive
    rows of one slice have ascending, disjoint ref spans (shared
    boundary units are clamped away pairwise)."""
    D = _plan_dense(per_ray, per_tile, cs_tab, n_tab, lo_tab, ka,
                    best_t, dims3, slab, any_hit)
    nt = D["nt"]
    S = slab

    nrows_d = jnp.where(D["rect_ok"], D["b1"] - D["b0"] + 1, 0)
    counts = nrows_d.reshape(-1)                        # (nt*S,)
    src, rank, valid_row, total_rows = expand_by_counts(counts, rowcap)
    tile_i = src // S

    # One packed feature table, gathered once per row item. Lanes:
    #  0:4 tl_q | 4:8 th_q | 8:12 b0q^ | 12:16 b1q^ | 16 k_cl^
    #  17 b0^ | 18 rbase^ (rs row base for (k_cl, j=0)) | 19 nc1^
    #  20 cs_b | 21 lo_b | 22 icc (1/cs_c) | 23 lo_c | 24 ncm1^
    #  32:36 ob_lo | 36:40 ob_hi | 40:44 db_lo | 44:48 db_hi
    #  48:52 oc_lo | 52:56 oc_hi | 56:60 dc_lo | 60:64 dc_hi
    # (^ = i32 bit pattern; quarter-bound lanes are per-tile values
    # broadcast across slices so ONE gather serves everything.)
    def t2s(v):  # (nt, SUB, S) -> (nt, S, SUB)
        return jnp.swapaxes(v, 1, 2)

    def bc(v):  # per-tile (nt,) or (nt, SUB) -> (nt, S, ...)
        return jnp.broadcast_to(
            v[:, None] if v.ndim == 1 else v[:, None, :],
            (nt, S) + v.shape[1:])

    nc1 = D["n_c"] + 1
    # Lane 18: rowinfo index base of the slice (qbase is the per-layout
    # ROW base; the ragged rs offset itself comes from rowinfo per row).
    rbase = D["qbase"][:, None] + D["k_cl"] * D["n_b"][:, None]
    fs = jnp.concatenate([
        t2s(D["tl"]), t2s(D["th"]),
        _fbits(t2s(D["b0q"])), _fbits(t2s(D["b1q"])),
        _fbits(D["k_cl"])[:, :, None],
        _fbits(D["b0"])[:, :, None],
        _fbits(rbase)[:, :, None],
        jnp.broadcast_to(_fbits(nc1)[:, None, None], (nt, S, 1)),
        jnp.broadcast_to(D["cs_b"][:, None, None], (nt, S, 1)),
        jnp.broadcast_to(D["lo_b"][:, None, None], (nt, S, 1)),
        jnp.broadcast_to((1.0 / D["cs_c"])[:, None, None], (nt, S, 1)),
        jnp.broadcast_to(D["lo_c"][:, None, None], (nt, S, 1)),
        jnp.broadcast_to(_fbits(D["n_c"] - 1)[:, None, None],
                         (nt, S, 1)),
        jnp.zeros((nt, S, 7), jnp.float32),
        bc(D["ob_lo"]), bc(D["ob_hi"]), bc(D["db_lo"]), bc(D["db_hi"]),
        bc(D["oc_lo"]), bc(D["oc_hi"]), bc(D["dc_lo"]), bc(D["dc_hi"]),
    ], axis=2).reshape(nt * S, 64)
    F = fs[src]                                          # (rowcap, 64)

    j = _bits(F[:, 17]) + rank                           # row index
    wb0 = F[:, 21] + j.astype(jnp.float32) * F[:, 20]
    wb1 = wb0 + F[:, 20]
    # Per-row refinement: rowinfo gather on the compact stream (the
    # column scale and the ragged rs offset are PER ROW now).
    ri = rowinfo[jnp.where(valid_row, _bits(F[:, 18]) + j, 0)]
    roff = ri & 0x0FFFFFFF
    lgm = ri >> 28
    icc = F[:, 22] * jnp.exp2(lgm.astype(jnp.float32))
    lo_c_r = F[:, 23]
    ncl = ((_bits(F[:, 24]) + 1) << lgm) - 1

    c0 = jnp.full((rowcap,), 2 ** 20, jnp.int32)
    c1 = jnp.full((rowcap,), -1, jnp.int32)
    row_any = jnp.zeros((rowcap,), bool)
    thr_t = jnp.full((rowcap,), _BIG, jnp.float32)
    for qq in range(_SUB):
        tlq = F[:, qq]
        thq = F[:, 4 + qq]
        b0qv = _bits(F[:, 8 + qq])
        b1qv = _bits(F[:, 12 + qq])
        oblo = F[:, 32 + qq]
        obhi = F[:, 36 + qq]
        dblo = F[:, 40 + qq]
        dbhi = F[:, 44 + qq]
        oclo = F[:, 48 + qq]
        ochi = F[:, 52 + qq]
        dclo = F[:, 56 + qq]
        dchi = F[:, 60 + qq]
        db_ok = (dblo > 1e-30) | (dbhi < -1e-30)
        ia = 1.0 / jnp.where(db_ok, dblo, 1.0)
        ib = 1.0 / jnp.where(db_ok, dbhi, 1.0)
        nlo0 = wb0 - obhi
        nhi0 = wb0 - oblo
        nlo1 = wb1 - obhi
        nhi1 = wb1 - oblo

        def hull4(na, nb, ia=ia, ib=ib):
            p0, p1 = na * ia, na * ib
            p2, p3 = nb * ia, nb * ib
            return (jnp.minimum(jnp.minimum(p0, p1),
                                jnp.minimum(p2, p3)),
                    jnp.maximum(jnp.maximum(p0, p1),
                                jnp.maximum(p2, p3)))

        e0_lo, e0_hi = hull4(nlo0, nhi0)
        e1_lo, e1_hi = hull4(nlo1, nhi1)
        tb_lo = jnp.minimum(e0_lo, e1_lo)
        tb_hi = jnp.maximum(e0_hi, e1_hi)
        tj_lo = jnp.where(db_ok, jnp.maximum(tlq, tb_lo), tlq)
        tj_hi = jnp.where(db_ok, jnp.minimum(thq, tb_hi), thq)
        okq = ((tlq <= thq) & (tj_lo <= tj_hi)
               & (j >= b0qv) & (j <= b1qv))
        x00 = tj_lo * dclo
        x01 = tj_lo * dchi
        x10 = tj_hi * dclo
        x11 = tj_hi * dchi
        vlo = oclo + jnp.minimum(jnp.minimum(x00, x01),
                                 jnp.minimum(x10, x11))
        vhi = ochi + jnp.maximum(jnp.maximum(x00, x01),
                                 jnp.maximum(x10, x11))
        c0q = jnp.clip(((vlo - lo_c_r) * icc).astype(jnp.int32), 0, ncl)
        c1q = jnp.clip(((vhi - lo_c_r) * icc).astype(jnp.int32), 0, ncl)
        c0 = jnp.minimum(c0, jnp.where(okq, c0q, 2 ** 20))
        c1 = jnp.maximum(c1, jnp.where(okq, c1q, -1))
        row_any = row_any | okq
        thr_t = jnp.minimum(thr_t, jnp.where(okq, tj_lo, _BIG))

    # rs span of the trimmed row (two gathers on the compact stream).
    safe0 = jnp.where(row_any, roff + jnp.minimum(c0, ncl), 0)
    safe1 = jnp.where(row_any, roff + jnp.maximum(c1, 0) + 1, 0)
    g1 = rs[safe0]
    g2 = rs[safe1]

    refs_u = _G * _U
    lo_g = g1 // refs_u
    hi_g = -(-g2 // refs_u)
    valid = valid_row & row_any & (g2 > g1)
    # Adjacent rows of one slice have ascending disjoint ref spans;
    # their unit round-outs can only share the single boundary unit,
    # clamped away pairwise (same argument as the dense planner's
    # running-max, restricted to distance 1 because spans of rows
    # r, r+2 can no longer touch after rounding out by < one unit).
    hi_m = jnp.where(valid, hi_g, 0)
    same_slot = jnp.concatenate(
        [jnp.zeros((1,), bool), src[1:] == src[:-1]])
    prev_hi = jnp.concatenate([jnp.zeros((1,), hi_m.dtype), hi_m[:-1]])
    lo_g = jnp.where(same_slot, jnp.maximum(lo_g, prev_hi), lo_g)
    cnt = jnp.where(valid, jnp.maximum(hi_g - lo_g, 0), 0)
    if any_hit:
        thr_row = jnp.full((rowcap,), _BIG_BITS - 1, jnp.int32)
    else:
        # Same threshold-safety suffix-min as the dense planner's
        # (see _plan): a clamped row's boundary unit rides under an
        # earlier row's emission, so thresholds must be non-increasing
        # toward earlier rows of one slot. Segmented (per-src) reverse
        # min-scan over the compact row stream.
        v = jnp.where(valid, _bits(thr_t), jnp.int32(_BIG_BITS))
        seg_last = jnp.concatenate(
            [src[:-1] != src[1:], jnp.ones((1,), bool)])

        def _segmin(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, jnp.minimum(va, vb))

        _, sfx = jax.lax.associative_scan(
            _segmin, (seg_last[::-1], v[::-1]))
        thr_row = sfx[::-1]

    # ---- block packing from the compact stream ----
    ex = jnp.cumsum(cnt) - cnt
    rows_t = nrows_d.sum(1)                              # (nt,)
    roff_t = jnp.cumsum(rows_t) - rows_t
    last_i = jnp.clip(roff_t + rows_t - 1, 0, rowcap - 1)
    first_i = jnp.clip(roff_t, 0, rowcap - 1)
    tile_units = jnp.where(rows_t > 0,
                           (ex + cnt)[last_i] - ex[first_i], 0)
    tile_pad = -(-tile_units // _UPB) * _UPB
    tile_base = jnp.cumsum(tile_pad) - tile_pad
    demand = tile_base[-1] + tile_pad[-1]                # units

    ii = jnp.arange(rowcap, dtype=jnp.int32)
    isb = (ii == 0) | (tile_i != jnp.concatenate(
        [tile_i[:1], tile_i[:-1]]))
    # ex is non-decreasing, so the running max of boundary ex values
    # is the CURRENT tile's first ex.
    first_ex = jax.lax.associative_scan(
        jnp.maximum, jnp.where(isb, ex, 0))
    roff = tile_base[tile_i] + (ex - first_ex)

    ucap = bcap * _UPB
    sr = lo_g - roff
    d_sr = jnp.diff(sr, prepend=0)
    d_thr = jnp.diff(thr_row, prepend=0)
    sr_ff = jnp.cumsum(jnp.zeros((ucap,), jnp.int32).at[roff].add(
        d_sr, mode="drop"))
    thr_ff = jnp.cumsum(jnp.zeros((ucap,), jnp.int32).at[roff].add(
        d_thr, mode="drop"))
    tminb = thr_ff.reshape(bcap, _UPB).min(axis=1)

    n_blocks = jnp.minimum(demand // _UPB, bcap)
    bmark = jnp.zeros((bcap,), jnp.int32).at[tile_base // _UPB].add(
        1, mode="drop")
    btile = jnp.clip(jnp.cumsum(bmark) - 1, 0, nt - 1)
    tile_of = jnp.where(jnp.arange(bcap) < n_blocks, btile, nt)
    own_end = (tile_base + tile_units)[jnp.minimum(btile, nt - 1)]
    slot = (jnp.arange(bcap, dtype=jnp.int32) * _UPB)[:, None] \
        + jnp.arange(_UPB, dtype=jnp.int32)[None, :]
    valid_u = slot < own_end[:, None]
    gidx = jnp.where(valid_u, slot + sr_ff.reshape(bcap, _UPB),
                     dead_idx)
    row_ovf = total_rows > rowcap
    return (gidx.reshape(-1), tile_of, tminb, n_blocks, demand,
            row_ovf, total_rows)


def _items(starts, counts, thr, nt, slab, bcap, dead_idx, rmax=_RMAX):
    """Pack the ranges' gather units into a dense per-round stream:
    gidx (bcap*_UPB,) unit indices to gather (dead_idx for padding),
    tile_of (bcap,) the owning tile per 16-unit block (nt for unused
    blocks), tminb (bcap,) the per-block early-out threshold (min of
    its units' slot thresholds, i32 f32-bits), n_blocks, and the
    unclamped unit demand (overflow detection). Each tile's segment is
    padded to a block (16-unit) multiple so blocks never straddle
    tiles."""
    nr = slab * (rmax + 1)
    ucap = bcap * _UPB
    cnt2 = counts.reshape(nt, nr)
    tile_tot = cnt2.sum(1)
    tile_pad = -(-tile_tot // _UPB) * _UPB
    tile_base = jnp.cumsum(tile_pad) - tile_pad
    within = jnp.cumsum(cnt2, axis=1) - cnt2
    roff = (tile_base[:, None] + within).reshape(-1)
    demand = tile_base[-1] + tile_pad[-1]

    # Per-slot (start - roff) and threshold via scatter-delta + cumsum
    # forward fill: piecewise-constant per range, NO per-slot gathers.
    # Stacked deltas of empty ranges telescope to the last range's
    # value.
    sr = starts - roff
    d_sr = jnp.diff(sr, prepend=0)
    d_thr = jnp.diff(thr, prepend=0)
    sr_ff = jnp.cumsum(jnp.zeros((ucap,), jnp.int32).at[roff].add(
        d_sr, mode="drop"))
    thr_ff = jnp.cumsum(jnp.zeros((ucap,), jnp.int32).at[roff].add(
        d_thr, mode="drop"))
    # Conservative per-block threshold: min over the block's units
    # (slice entry t is usually monotone within a tile, but quarters
    # dropping in/out of the rect union can break that; min is always
    # safe). Pad units carry a stale neighbor threshold — also safe.
    tminb = thr_ff.reshape(bcap, _UPB).min(axis=1)

    n_blocks = jnp.minimum(demand // _UPB, bcap)
    bmark = jnp.zeros((bcap,), jnp.int32).at[tile_base // _UPB].add(
        1, mode="drop")
    btile = jnp.clip(jnp.cumsum(bmark) - 1, 0, nt - 1)
    tile_of = jnp.where(jnp.arange(bcap) < n_blocks, btile, nt)
    # Unit validity from the owner tile's segment end (cheap (bcap,)
    # gathers instead of a third ucap-wide forward-fill cumsum): pad
    # units within a block and whole blocks past the demand both fall
    # beyond their owner's end.
    own_end = (tile_base + tile_tot)[jnp.minimum(btile, nt - 1)]
    slot = (jnp.arange(bcap, dtype=jnp.int32) * _UPB)[:, None] \
        + jnp.arange(_UPB, dtype=jnp.int32)[None, :]
    valid = slot < own_end[:, None]
    gidx = jnp.where(valid, slot + sr_ff.reshape(bcap, _UPB), dead_idx)
    return gidx.reshape(-1), tile_of, tminb, n_blocks, demand


def _merge(best, out_ext, tile_of):
    """Fold one sweep chunk's output into the running per-ray best.
    Chunks may split a tile's block run; each partial flush merges
    correctly because closest-hit is a min-reduction. Exact-t ties
    prefer the smaller tri id (same rule as the in-kernel flush), so
    results do not depend on where chunk boundaries fall."""
    best_t, best_id, best_u, best_v = best
    nt, tile = best_t.shape
    touched = jnp.zeros((nt + 1,), jnp.bool_).at[tile_of].set(True)[:nt]
    t_new = out_ext[0, :nt * tile].reshape(nt, tile)
    id_new = out_ext[1, :nt * tile].astype(jnp.int32).reshape(nt, tile)
    improved = touched[:, None] & (
        (t_new < best_t)
        | ((t_new == best_t) & (id_new >= 0)
           & ((id_new < best_id) | (best_id < 0))))
    return (jnp.where(improved, t_new, best_t),
            jnp.where(improved, id_new, best_id),
            jnp.where(improved,
                      out_ext[2, :nt * tile].reshape(nt, tile), best_u),
            jnp.where(improved,
                      out_ext[3, :nt * tile].reshape(nt, tile), best_v))


# ----------------------------------------------------------------------
# Whole-frame jit: all rounds, zero device->host reads
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "dims3", "slab", "any_hit", "tile", "bcaps", "interpret", "dma",
    "rmax", "compact", "rowcaps"))
def _frame(xp_ext, xt_ext, bbox_lo, bbox_hi, rs, rowinfo, cols, planes,
           dims3, slab, any_hit, tile, bcaps, interpret, dma=False,
           rmax=_RMAX, compact=False, rowcaps=None):
    nt = xp_ext.shape[0] // tile - 1
    cs_tab, n_tab, lo_tab = _tile_tabs(bbox_lo, bbox_hi, dims3)
    per_ray, per_tile = _precompute(xp_ext[:nt * tile], cs_tab, n_tab,
                                    lo_tab, bbox_lo, bbox_hi, tile,
                                    planes)
    # Untraceable lanes (padding, and tmax<=0 "masked dead" secondary
    # rays) get best = -BIG so the kernel's all-lanes-done early-out
    # can still fire for their tiles; they can never produce a hit.
    traceable = xp_ext[:nt * tile, 13].reshape(nt, tile) > 0
    best = (jnp.where(traceable, _BIG, -_BIG),
            jnp.full((nt, tile), -1, jnp.int32),
            jnp.zeros((nt, tile), jnp.float32),
            jnp.zeros((nt, tile), jnp.float32))
    ka = per_tile["k0"]
    step = per_tile["step"]
    # Gather units: aligned (8, 128) tiles of the group-row cols table
    # (a layout-preserving reshape — group rows ARE the stored form).
    # The zero tail group rows form exactly the last unit — the dead
    # gather target.
    cols_u = cols.reshape(-1, _U, _GW)
    dead_idx = cols_u.shape[0] - 1
    overflow = jnp.int32(0)
    demand_max = jnp.int32(0)              # peak per-round block demand
    rows_max = jnp.int32(0)                # peak per-round live rows
    # bcaps: per-round static block budgets (measured round demands
    # decay fast — Sponza primaries 4493/2213/0 — and the items stage
    # costs O(bcap) whether blocks are live or not).
    for ri, bcap in enumerate(bcaps):
        if compact:
            rowcap = rowcaps[ri]
            gidx, tile_of, tminb, n_blocks, demand, row_ovf, nrow = \
                _plan_items2(per_ray, per_tile, cs_tab, n_tab, lo_tab,
                             rs, rowinfo, ka, best[0], dims3, slab,
                             any_hit, rowcap, bcap, dead_idx)
            overflow = overflow | row_ovf
            rows_max = jnp.maximum(rows_max, nrow)
        else:
            starts, counts, thr = _plan(
                per_ray, per_tile, cs_tab, n_tab, lo_tab, rs, rowinfo,
                ka, best[0], dims3, slab, any_hit, rmax=rmax)
            gidx, tile_of, tminb, n_blocks, demand = _items(
                starts, counts, thr, nt, slab, bcap, dead_idx,
                rmax=rmax)
        overflow = overflow | (demand > bcap * _UPB)
        demand_max = jnp.maximum(demand_max, demand // _UPB)
        # Kernel seed row: current best per binned lane (dummy tile
        # keeps -BIG so its blocks are skipped outright). Closest-hit
        # folds tmax into the seed so the kernel drops its per-pair
        # t < tmax test; any-hit seeds the raw best (its done
        # threshold means "found any hit", which a tmax seed would
        # trip immediately).
        seed = best[0]
        if not any_hit:
            tmax_l = xp_ext[:nt * tile, 13].reshape(nt, tile)
            seed = jnp.minimum(seed, tmax_l)
        xt_round = jax.lax.dynamic_update_slice(
            xt_ext,
            jnp.concatenate([seed.reshape(1, -1),
                             jnp.full((1, tile), -_BIG)], axis=1),
            (14, 0))
        if dma:
            # In-kernel DMA gather: no pre-gathered stream at all — the
            # sweep kernel fetches each block's 16 aligned (8, 128)
            # units straight from `cols` in HBM, double-buffered one
            # block ahead, and skips the fetch for early-out blocks.
            # Chunks run under lax.while_loop with a DYNAMIC trip
            # count: only live chunks dispatch, and the program holds
            # ONE pallas_call regardless of bcap. (Round 4 unrolled
            # this loop in Python; at honest incoherent budgets —
            # hundreds of chunks over the round ladder — the unrolled
            # frame reached a 170MB MLIR module that took tens of
            # minutes to compile and OOM-killed this environment's
            # compile helper. Budget rungs still recompile — shapes
            # change — but each compile is now small and cached.)
            w = min(_CHUNK, bcap)

            def chunk_body(state, xt_round=xt_round, gidx=gidx,
                           tile_of=tile_of, tminb=tminb, w=w):
                i, best = state
                off = i * w
                # Edge chunks clamp to [bcap - w, bcap): re-sweeping
                # blocks already merged is exact (closest-hit is a
                # min-reduction with a stable id tie-break; any-hit
                # likewise idempotent).
                t_c = jax.lax.dynamic_slice_in_dim(tile_of, off, w)
                tb_c = jax.lax.dynamic_slice_in_dim(tminb, off, w)
                gi_c = jax.lax.dynamic_slice_in_dim(
                    gidx, off * _UPB, w * _UPB)
                out_ext = _sweep_dma(xt_round, cols, gi_c, t_c,
                                     tb_c, tile, any_hit)
                return (i + 1, _merge(best, out_ext, t_c))

            def chunk_cond(state, n_blocks=n_blocks, w=w):
                # min with bcap: an overflowed round may report demand
                # beyond the budget; only budgeted blocks exist.
                return state[0] * w < jnp.minimum(n_blocks, bcap)

            _, best = jax.lax.while_loop(
                chunk_cond, chunk_body, (jnp.int32(0), best))
            ka = ka + step * slab
            continue
        # Gather in cond-gated pieces so round slack is never gathered
        # (aligned (8, 128) units read exactly their bytes; the pieces
        # are XLA ops inside the frame, launch-free). Pieces concatenate instead of updating one
        # bcap-wide canvas: no giant buffer is threaded through the
        # conds.
        pieces = []
        for goff in range(0, bcap, _GCHUNK):
            gw = min(_GCHUNK, bcap - goff)

            def do_gather(gi, gw=gw):
                return cols_u[gi].reshape(gw * 128, _GW)

            def skip(gi, gw=gw):
                return jnp.zeros((gw * 128, _GW), jnp.float32)

            pieces.append(jax.lax.cond(
                n_blocks > goff, do_gather, skip,
                gidx[goff * _UPB:(goff + gw) * _UPB]))
        g_round = pieces[0] if len(pieces) == 1 else jnp.concatenate(
            pieces, axis=0)
        # Sweep launches are fixed-count; unused blocks carry the dummy
        # tile and skip all vector work (~0.4us each).
        for off in range(0, bcap, _CHUNK):
            w = min(_CHUNK, bcap - off)
            t_c = tile_of[off:off + w]
            tb_c = tminb[off:off + w]
            g_c = jax.lax.slice_in_dim(g_round, off * 128,
                                       (off + w) * 128)

            def do_chunk(best, t_c=t_c, tb_c=tb_c, g_c=g_c):
                out_ext = _sweep(xt_round, g_c, t_c, tb_c, 0, tile,
                                 any_hit, interpret)
                return _merge(best, out_ext, t_c)

            best = jax.lax.cond(n_blocks > off, do_chunk,
                                lambda b: b, best)
        ka = ka + step * slab
    return best, overflow, jnp.stack([demand_max, rows_max])


# ----------------------------------------------------------------------
# Public entry
# ----------------------------------------------------------------------

def trace_sweep(grid: PacketGrid, rays: Rays, any_hit: bool = False,
                interpret: bool = False, tile: int | None = None,
                slab: int | None = None, bmax: int | None = None,
                return_overflow: bool = False,
                coherent: bool = False,
                return_demand: bool = False,
                dma: bool | None = None,
                fine_bins: bool | None = None,
                rmax: int | None = None,
                compact: bool | None = None,
                rowmax: int | None = None):
    """Trace rays against a PacketGrid with the planned-sweep kernel.

    The frame runs as one jitted computation with no host syncs. If a
    round demands more than `bmax` 128-ref blocks, the surplus is
    dropped and the device-side overflow flag is set (request it with
    return_overflow=True, or raise bmax). coherent=True skips the
    (axis, sign) binning permutation for waves that are already
    direction-coherent in order (camera primaries): measured ~29 ms of
    a 1M-ray frame. slab=None plans the WHOLE grid in one round: the
    in-kernel early-out replaces inter-round replanning (its block
    skips terminate exactly where replanning would), saving the later
    rounds' plan/items/merge cost; pass a smaller slab to re-plan with
    tightened t-caps between slabs (useful when rays terminate early
    AND panel demand is budget-limited). On the CPU backend the kernel
    falls back to interpret mode (Mosaic is TPU-only)."""
    if jax.default_backend() == "cpu":
        interpret = True
    if dma is None:
        # In-kernel DMA gather is the TPU default; interpret mode
        # (CPU tests) lacks Mosaic DMA, so it keeps the XLA gather.
        dma = not interpret
    da_max = max(d[0] for d in grid.dims3)
    if compact is None:
        # Incoherent waves have TALL rects (origins at every depth):
        # with the dense planner, rows past the trimmed slots fall
        # into an untrimmed multi-row tail that carries most of their
        # demand (measured: Sponza AO 173.6k -> 62.6k blocks at
        # rmax=16), but dense slot costs scale with rmax. The compact
        # planner trims EVERY row at cost proportional to live rows.
        compact = not coherent
    if tile is None:
        # Compact incoherent waves: measured on the Sponza AO wave
        # (origin-major sorted, slab=8): tile 512 -> 16.1G pair-slots,
        # 256 -> 11.7G (455 ms/wave), 128 -> 8.6G but 596 ms/wave
        # (block/row overheads outgrow the pair cut). 256 is the knee.
        tile = 256 if compact else 512
    if slab is None:
        # Compact waves re-plan between slabs with tightened t-caps
        # (any-hit rays terminate fast; per-round budgets then shrink
        # by the ladder below). Coherent closest-hit waves instead
        # plan the whole grid once and rely on the in-kernel early-out
        # (measured round 3: replanning saved nothing there).
        slab = 8 if compact else da_max
    if fine_bins is None:
        # MEASURED OFF by default: on a Sponza AO wave the 24-group
        # minor-sign split RAISED block demand 173k -> 284k (and
        # 103.7k -> 126.8k on origin-sorted rays) — the finer groups
        # scatter each tile's origins across the image, and origin
        # spread costs more than the narrower direction fan saves.
        # Kept as an option for waves with no origin locality at all.
        fine_bins = False
    n = rays.count
    ngroups = (_NGROUPS_FINE if fine_bins else _NGROUPS) - 1
    n_pad = (-(-n // tile) + (0 if coherent else ngroups + 1)) * tile
    nt = n_pad // tile
    max_rounds = -(-da_max // slab)
    if bmax is None:
        # Incoherent (any-hit) waves have far wider frusta per tile;
        # budget slack only costs gated-chunk skips, so scale up.
        scale = 12 if any_hit else 6
        bmax = min(24576 if any_hit else 12288, max(128, scale * nt))
    if coherent:
        xp_ext, xt_ext = _pad_coherent(rays.org, rays.dir, rays.tmin,
                                       rays.tmax, n_pad, tile)
        inv = None
    else:
        xp_ext, xt_ext, inv = _bin_rays(rays.org, rays.dir, rays.tmin,
                                        rays.tmax, n_pad, tile,
                                        fine=fine_bins)

    # Per-round budget ladder: round demands decay fast once rays start
    # terminating (measured 4493/2213/0 blocks on Sponza primaries), and
    # the items stage costs O(budget) regardless of live blocks. Later
    # rounds run on a fraction of bmax; the overflow flag still reports
    # any round whose demand exceeded its cap.
    def _cap(r):
        if r == 0:
            f = 1.0
        elif any_hit:
            f = 0.75 if r == 1 else 0.5
        else:
            f = 0.625 if r == 1 else 0.375
        return max(128, int(bmax * f) // 128 * 128)

    bcaps = tuple(_cap(r) for r in range(max_rounds))
    if rmax is None:
        rmax = _RMAX
    if rowmax is None:
        # Live trimmed rows per round (compact planner). Rows can
        # outnumber units (rows that trim to empty still occupy
        # expansion slots), so the default is a full unit budget's
        # worth; calibrate with return_demand (which reports the true
        # peak row count) to shrink it.
        rowmax = bcaps[0] * _UPB
    rowcaps = tuple(
        max(4096, (-(-rowmax * b // bcaps[0]) // 8) * 8 + 8)
        for b in bcaps) if compact else None
    best, overflow, demand = _frame(
        xp_ext, xt_ext, grid.bbox_lo, grid.bbox_hi, grid.rs,
        grid.rowinfo, grid.cols, grid.planes, grid.dims3, slab,
        any_hit, tile, bcaps, interpret, dma=dma, rmax=rmax,
        compact=compact, rowcaps=rowcaps)

    # Ids stay int32 all the way out: a float bitcast round-trip here
    # can silently canonicalize the NaN-pattern id bits (found by the
    # CLI verify drive: -1 came back as 0x7FC00000).
    t_f = best[0].reshape(-1)
    id_i = best[1].reshape(-1)
    u_f = best[2].reshape(-1)
    v_f = best[3].reshape(-1)
    if inv is None:
        tri = id_i[:n]
        found = tri >= 0
        hits = Hits(tri_id=tri, t=jnp.where(found, t_f[:n], jnp.inf),
                    u=u_f[:n], v=v_f[:n])
    else:
        hits = _unbin(t_f, id_i, u_f, v_f, inv, n)
    out = (hits,)
    if return_overflow:
        out = out + (overflow,)
    if return_demand:
        # i32[2]: [peak round block demand, peak round live rows]
        # (rows only meaningful on the compact path; 0 otherwise).
        out = out + (demand,)
    return out if len(out) > 1 else hits


@functools.partial(jax.jit, static_argnames=("n",))
def _unbin(t_f, id_i, u_f, v_f, inv, n):
    safe = jnp.where(inv >= 0, inv, n)
    t = jnp.full((n + 1,), jnp.inf, jnp.float32).at[safe].set(t_f)
    idb = jnp.full((n + 1,), -1, jnp.int32).at[safe].set(id_i)
    u = jnp.zeros((n + 1,), jnp.float32).at[safe].set(u_f)
    v = jnp.zeros((n + 1,), jnp.float32).at[safe].set(v_f)
    tri = idb[:n]
    found = tri >= 0
    return Hits(tri_id=tri, t=jnp.where(found, t[:n], jnp.inf),
                u=u[:n], v=v[:n])
