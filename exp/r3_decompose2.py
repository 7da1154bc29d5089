#!/usr/bin/env python
"""Round-3 decomposition of the CURRENT (single-round, MT20) frame.

Questions:
  1. Stage split: precompute / plan / items / gather / sweep kernel.
  2. Block demand: how many of bcap blocks are live?
  3. Per-quarter rects: if blocks were emitted per QUARTER (tile/4 rays)
     instead of per tile-union, what would the total gathered-ref demand
     be (in 128-ref block units at the same tile width)?

Run:  python exp/r3_decompose2.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hagrid_tpu import scenes
from hagrid_tpu.core.camera import primary_rays
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.grid.packet import build_packet
from hagrid_tpu.ops import sweep_trace as st
from hagrid_tpu.utils import cache

cache.enable()


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
grid = build_packet(tris)
log(f"dims3={grid.dims3} ref_cap={grid.ref_capacity} "
    f"refs={int(jax.device_get(grid.total_refs))}")

W = H = 1024
rays = primary_rays(cam, W, H, order="block")
rays = jax.block_until_ready(jax.device_put(rays))
n = rays.count
TILE = 512
n_pad = -(-n // TILE) * TILE
nt = n_pad // TILE
da_max = max(d[0] for d in grid.dims3)
slab = da_max
bmax = min(12288, max(128, 6 * nt))
bcap = max(128, int(bmax * 1.0) // 128 * 128)
log(f"n={n} nt={nt} slab={slab} bcap={bcap}")


# --- staged variants of _frame (single round) -------------------------
@functools.partial(jax.jit, static_argnames=("dims3", "slab", "tile",
                                             "bcap", "stage"))
def frame_stage(xp_ext, xt_ext, bbox_lo, bbox_hi, rs, cols,
                dims3, slab, tile, bcap, stage):
    nt = xp_ext.shape[0] // tile - 1
    cs_tab, n_tab, lo_tab = st._tile_tabs(bbox_lo, bbox_hi, dims3)
    per_ray, per_tile = st._precompute(xp_ext[:nt * tile], cs_tab,
                                       n_tab, lo_tab, bbox_lo, bbox_hi,
                                       tile)
    traceable = xp_ext[:nt * tile, 13].reshape(nt, tile) > 0
    best = (jnp.where(traceable, st._BIG, -st._BIG),
            jnp.full((nt, tile), -1, jnp.int32),
            jnp.zeros((nt, tile), jnp.float32),
            jnp.zeros((nt, tile), jnp.float32))
    ka = per_tile["k0"]
    if stage == 0:  # precompute only
        return per_ray["enter"].sum() + ka.sum()
    cols_g = cols.reshape(-1, 20 * st._G)
    dead_idx = cols_g.shape[0] - 1
    starts, counts, thr = st._plan(per_ray, per_tile, cs_tab, n_tab,
                                   lo_tab, rs, ka, best[0], dims3,
                                   slab, False)
    if stage == 1:  # + plan
        return starts.sum() + counts.sum() + thr.sum()
    gidx, tile_of, tminb, n_blocks, demand = st._items(
        starts, counts, thr, nt, slab, bcap, dead_idx)
    if stage == 2:  # + items
        return gidx.sum() + tile_of.sum() + tminb.sum() + demand
    pieces = []
    for goff in range(0, bcap, st._GCHUNK):
        gw = min(st._GCHUNK, bcap - goff)

        def do_gather(gi, gw=gw):
            return cols_g[gi]

        def skip(gi, gw=gw):
            return jnp.zeros((gw * 128, 20 * st._G), jnp.float32)

        pieces.append(jax.lax.cond(
            n_blocks > goff, do_gather, skip,
            gidx[goff * 128:(goff + gw) * 128]))
    g_round = pieces[0] if len(pieces) == 1 else jnp.concatenate(
        pieces, axis=0)
    if stage == 3:  # + gather
        return g_round.sum()
    xt_round = jax.lax.dynamic_update_slice(
        xt_ext,
        jnp.concatenate([best[0].reshape(1, -1),
                         jnp.full((1, tile), -st._BIG)], axis=1),
        (14, 0))
    for off in range(0, bcap, st._CHUNK):
        w = min(st._CHUNK, bcap - off)
        t_c = tile_of[off:off + w]
        tb_c = tminb[off:off + w]
        g_c = jax.lax.slice_in_dim(g_round, off * 128, (off + w) * 128)

        def do_chunk(best, t_c=t_c, tb_c=tb_c, g_c=g_c):
            out_ext = st._sweep(xt_round, g_c, t_c, tb_c, 0, tile, False)
            return st._merge(best, out_ext, t_c)

        best = jax.lax.cond(n_blocks > off, do_chunk, lambda b: b, best)
    return best[0].sum() + best[1].sum()


xp_ext, xt_ext = st._pad_coherent(rays.org, rays.dir, rays.tmin,
                                  rays.tmax, n_pad, TILE)
xp_ext = jax.block_until_ready(xp_ext)
args = (xp_ext, xt_ext, grid.bbox_lo, grid.bbox_hi, grid.rs, grid.cols)

names = ["precompute", "+plan", "+items", "+gather", "+sweep(full)"]
prev = 0.0
for s, name in enumerate(names):
    t = timed(functools.partial(frame_stage, dims3=grid.dims3,
                                slab=slab, tile=TILE, bcap=bcap,
                                stage=s), *args)
    log(f"stage {s} {name:14s}: {t * 1e3:8.2f} ms  (+{(t - prev) * 1e3:7.2f})")
    prev = t

full = timed(lambda r: st.trace_sweep(grid, r, coherent=True), rays)
log(f"trace_sweep full: {full * 1e3:.2f} ms -> "
    f"{n / full / 1e6:.1f} Mrays/s")


# --- demand: union vs per-quarter -------------------------------------
@functools.partial(jax.jit, static_argnames=("dims3", "slab", "tile"))
def demand_probe(xp_ext, bbox_lo, bbox_hi, rs, dims3, slab, tile):
    nt = xp_ext.shape[0] // tile - 1
    cs_tab, n_tab, lo_tab = st._tile_tabs(bbox_lo, bbox_hi, dims3)
    per_ray, per_tile = st._precompute(xp_ext[:nt * tile], cs_tab,
                                       n_tab, lo_tab, bbox_lo, bbox_hi,
                                       tile)
    best = jnp.full((nt, tile), st._BIG, jnp.float32)
    starts, counts, _thr = st._plan(per_ray, per_tile, cs_tab, n_tab,
                                    lo_tab, rs, per_tile["k0"], best,
                                    dims3, slab, False)
    cnt2 = counts.reshape(nt, -1)
    tile_tot = cnt2.sum(1)
    tile_pad = -(-tile_tot // 128) * 128
    return tile_tot.sum(), tile_pad.sum() // 128


tot_g, blocks = jax.device_get(demand_probe(
    xp_ext, grid.bbox_lo, grid.bbox_hi, grid.rs,
    dims3=grid.dims3, slab=slab, tile=TILE))
log(f"union tile=512: groups={int(tot_g)} refs={int(tot_g) * 4} "
    f"blocks={int(blocks)} (bcap {bcap})")

# Per-quarter: treat each quarter as its own "tile" of 128 rays by
# re-binning with tile=128 (block order means quarters of a 512-tile
# are the 128-tiles in order).
n_pad_q = -(-n // 128) * 128
xq_ext, _ = st._pad_coherent(rays.org, rays.dir, rays.tmin, rays.tmax,
                             n_pad_q, 128)
tot_gq, blocks_q = jax.device_get(demand_probe(
    xq_ext, grid.bbox_lo, grid.bbox_hi, grid.rs,
    dims3=grid.dims3, slab=slab, tile=128))
log(f"quarter tile=128: groups={int(tot_gq)} refs={int(tot_gq) * 4} "
    f"blocks={int(blocks_q)}")
log(f"pair ratio (512-union vs 128): "
    f"{int(tot_g) * 4 * 512 / max(1, int(tot_gq) * 4 * 128):.2f}x")
