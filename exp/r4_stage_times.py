#!/usr/bin/env python
"""Round-4 stage split for the DMA sweep path + round-out statistics.

Stages: precompute | +plan | +items | +sweep(dma). Also reports exact
vs unit-rounded ref counts from the plan (the 48-ref round-out cost)
and the tile-block quantization loss.
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


def timed_pipe(fn, k=8, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(k)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / k)
    return float(np.median(ts))


v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
grid = build_packet(tris)
rays = primary_rays(cam, 1024, 1024, order="block")
rays = jax.block_until_ready(jax.device_put(rays))
n = rays.count

TILE = 512
n_pad = -(-n // TILE) * TILE
xp_ext, xt_ext = st._pad_coherent(rays.org, rays.dir, rays.tmin,
                                  rays.tmax, n_pad, TILE)
xp_ext = jax.block_until_ready(xp_ext)
slab = max(dd[0] for dd in grid.dims3)

h0, ovf0, dem = st.trace_sweep(grid, rays, coherent=True,
                               return_overflow=True, return_demand=True)
d = int(jax.device_get(dem)[0])
BCAP = max(256, -(-int(d * 13) // 1280) * 128)
log(f"demand={d} blocks ({d * st._BREF} ref slots) BCAP={BCAP}")


@functools.partial(jax.jit, static_argnames=("upto",))
def stage(xp_ext, xt_ext, upto):
    nt = xp_ext.shape[0] // TILE - 1
    cs_tab, n_tab, lo_tab = st._tile_tabs(grid.bbox_lo, grid.bbox_hi,
                                          grid.dims3)
    per_ray, per_tile = st._precompute(
        xp_ext[:nt * TILE], cs_tab, n_tab, lo_tab, grid.bbox_lo,
        grid.bbox_hi, TILE, grid.planes)
    traceable = xp_ext[:nt * TILE, 13].reshape(nt, TILE) > 0
    best = (jnp.where(traceable, st._BIG, -st._BIG),
            jnp.full((nt, TILE), -1, jnp.int32),
            jnp.zeros((nt, TILE), jnp.float32),
            jnp.zeros((nt, TILE), jnp.float32))
    if upto == 0:
        return per_ray["enter"].sum() + per_tile["k0"].sum()
    starts, counts, thr = st._plan(
        per_ray, per_tile, cs_tab, n_tab, lo_tab, grid.rs,
        per_tile["k0"], best[0], grid.dims3, slab, False)
    if upto == 1:
        return starts.sum() + counts.sum()
    cols_u = grid.cols.reshape(-1, st._U, st._GW)
    dead_idx = cols_u.shape[0] - 1
    gidx, tile_of, tminb, n_blocks, demand = st._items(
        starts, counts, thr, nt, slab, BCAP, dead_idx)
    if upto == 2:
        return gidx.sum() + tminb.sum() + n_blocks
    seed = jnp.minimum(best[0], xp_ext[:nt * TILE, 13].reshape(nt, TILE))
    xt_round = jax.lax.dynamic_update_slice(
        xt_ext,
        jnp.concatenate([seed.reshape(1, -1),
                         jnp.full((1, TILE), -st._BIG)], axis=1),
        (14, 0))
    for off in range(0, BCAP, st._CHUNK):
        w = min(st._CHUNK, BCAP - off)
        t_c = tile_of[off:off + w]
        tb_c = tminb[off:off + w]
        gi_c = gidx[off * st._UPB:(off + w) * st._UPB]

        def do_chunk(best, t_c=t_c, tb_c=tb_c, gi_c=gi_c):
            out_ext = st._sweep_dma(xt_round, grid.cols, gi_c, t_c,
                                    tb_c, TILE, False)
            return st._merge(best, out_ext, t_c)

        best = jax.lax.cond(n_blocks > off, do_chunk, lambda b: b, best)
    return best[0].sum() + best[1].sum()


snames = ["precompute", "+plan", "+items", "+sweep(dma)"]
prev = 0.0
for upto in range(4):
    t = timed_pipe(functools.partial(stage, xp_ext, xt_ext, upto=upto))
    log(f"[stage] {snames[upto]:12s}: {t * 1e3:7.2f} ms "
        f"(+{1e3 * (t - prev):6.2f})")
    prev = t


# ---- Round-out statistics (host-side, from one plan) ---------------------
@jax.jit
def plan_once(xp_ext):
    nt = xp_ext.shape[0] // TILE - 1
    cs_tab, n_tab, lo_tab = st._tile_tabs(grid.bbox_lo, grid.bbox_hi,
                                          grid.dims3)
    per_ray, per_tile = st._precompute(
        xp_ext[:nt * TILE], cs_tab, n_tab, lo_tab, grid.bbox_lo,
        grid.bbox_hi, TILE, grid.planes)
    traceable = xp_ext[:nt * TILE, 13].reshape(nt, TILE) > 0
    best0 = jnp.where(traceable, st._BIG, -st._BIG)
    return st._plan(per_ray, per_tile, cs_tab, n_tab, lo_tab, grid.rs,
                    per_tile["k0"], best0, grid.dims3, slab, False), nt


(starts, counts, thr), nt = plan_once(xp_ext)
starts = np.asarray(starts)
counts = np.asarray(counts)  # in UNITS
refs_u = st._G * st._U
unit_refs = counts.sum() * refs_u
# Exact refs: reconstruct from _plan internals? counts are already
# unit-rounded; instead re-derive exact by calling _plan's range math
# is invasive — approximate: exact refs unavailable here, report unit
# stats + block quantization.
nr = slab * (st._RMAX + 1)
cnt2 = counts.reshape(nt, nr)
tile_tot = cnt2.sum(1)
tile_pad = -(-tile_tot // st._UPB) * st._UPB
log(f"[roundout] unit refs gathered: {unit_refs / 1e6:.2f} M "
    f"({counts.sum()} units), block pad adds "
    f"{(tile_pad.sum() - tile_tot.sum()) * refs_u / 1e6:.2f} M; "
    f"blocks={tile_pad.sum() // st._UPB}")
log(f"[roundout] ranges: {np.count_nonzero(counts)} nonzero, "
    f"mean {counts[counts > 0].mean():.2f} units "
    f"(p50 {np.percentile(counts[counts > 0], 50):.0f}, "
    f"p90 {np.percentile(counts[counts > 0], 90):.0f})")
