#!/usr/bin/env python
"""Attribute the in-frame cost of each stage of the sweep tracer by
running the REAL frame with stages neutralized:

  full      : the production frame (coherent primaries)
  skip_mt   : tminb := INT_MAX-1 -> every block's early-out fires
              (gather + plan + items + merge remain)
  no_sweep  : n_blocks := 0 -> gather/sweep/merge conds all skip
              (plan + items only)
  plan_only : rounds run _plan but not _items

Differences give: MT body, gather+sweep+merge shell, items, plan.
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
rays = primary_rays(cam, 1024, 1024, order="block")
rays = jax.block_until_ready(jax.device_put(rays))
N = rays.count
tile, slab = 512, 16
n_pad = -(-N // tile) * tile
bmax = 12288


@functools.partial(jax.jit, static_argnames=("dims3", "slab", "tile",
                                             "bmax", "max_rounds",
                                             "mode"))
def frame_mode(xp_ext, xt_ext, bbox_lo, bbox_hi, rs, cols, dims3, slab,
               tile, bmax, max_rounds, mode):
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
    step = per_tile["step"]
    cols_g = cols.reshape(-1, 16 * st._G)
    dead_idx = cols_g.shape[0] - 1
    for _ in range(max_rounds):
        starts, counts, thr = st._plan(per_ray, per_tile, cs_tab, n_tab,
                                       lo_tab, rs, ka, best[0], dims3,
                                       slab, False)
        if mode == "plan_only":
            best = (best[0] + 0 * starts[0].astype(jnp.float32) * counts[
                0] * thr[0], best[1], best[2], best[3])
            ka = ka + step * slab
            continue
        gidx, tile_of, tminb, n_blocks, demand = st._items(
            starts, counts, thr, nt, slab, bmax, dead_idx)
        if mode == "no_sweep":
            n_blocks = jnp.int32(0)
            best = (best[0] + 0 * gidx[0].astype(jnp.float32)
                    + 0 * tminb[0].astype(jnp.float32), best[1],
                    best[2], best[3])
        if mode == "skip_mt":
            tminb = jnp.full_like(tminb, 2 ** 31 - 2)
        xt_round = jax.lax.dynamic_update_slice(
            xt_ext,
            jnp.concatenate([best[0].reshape(1, -1),
                             jnp.full((1, tile), -st._BIG)], axis=1),
            (14, 0))
        g_round = jnp.zeros((bmax * 128, 16 * st._G), jnp.float32)
        for goff in range(0, bmax, st._GCHUNK):
            gw = min(st._GCHUNK, bmax - goff)

            def do_gather(g, goff=goff, gw=gw):
                piece = cols_g[gidx[goff * 128:(goff + gw) * 128]]
                return jax.lax.dynamic_update_slice(
                    g, piece, (goff * 128, 0))

            g_round = jax.lax.cond(n_blocks > goff, do_gather,
                                   lambda g: g, g_round)
        for off in range(0, bmax, st._CHUNK):
            w = min(st._CHUNK, bmax - off)
            t_c = tile_of[off:off + w]
            tb_c = tminb[off:off + w]
            g_c = jax.lax.slice_in_dim(g_round, off * 128,
                                       (off + w) * 128)

            def do_chunk(best, t_c=t_c, tb_c=tb_c, g_c=g_c):
                out_ext = st._sweep(xt_round, g_c, t_c, tb_c, 0, tile,
                                    False)
                return st._merge(best, out_ext, t_c)

            best = jax.lax.cond(n_blocks > off, do_chunk,
                                lambda b: b, best)
        ka = ka + step * slab
    return best


xp_ext, xt_ext = st._pad_coherent(rays.org, rays.dir, rays.tmin,
                                  rays.tmax, n_pad, tile)
jax.block_until_ready(xp_ext)
max_rounds = -(-max(d[0] for d in grid.dims3) // slab) + 1
log(f"max_rounds={max_rounds} bmax={bmax}")

for mode in ("plan_only", "no_sweep", "skip_mt", "full"):
    t = timed(lambda m=mode: frame_mode(
        xp_ext, xt_ext, grid.bbox_lo, grid.bbox_hi, grid.rs, grid.cols,
        grid.dims3, slab, tile, bmax, max_rounds, m)[0])
    log(f"{mode:10s}: {t * 1e3:8.2f} ms")

# Reference: production trace_sweep, coherent.
t = timed(lambda: st.trace_sweep(grid, rays, coherent=True).t)
log(f"production: {t * 1e3:8.2f} ms  ({N / t / 1e6:.2f} Mrays/s)")

# And pipelined (8 deep) to amortize the ~24ms sync.
def run8():
    return [st.trace_sweep(grid, rays, coherent=True).t
            for _ in range(8)]

t8 = timed(run8, warmup=1, iters=3)
log(f"production pipelined: {t8 / 8 * 1e3:.2f} ms/frame "
    f"({8 * N / t8 / 1e6:.2f} Mrays/s)")
