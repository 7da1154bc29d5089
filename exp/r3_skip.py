#!/usr/bin/env python
"""Split the sweep kernel time: MT-executed blocks vs skip shell.

Variants of the (single-round) frame at calibrated bcap:
  normal    : production tminb
  skip_all  : tminb := INT32_MAX  -> every live block skips its MT body
  skip_none : tminb := -1         -> no block ever skips (f32-bit order:
              any non-negative best > -1)
Differences: skip_all = shell (DMA + flush + grid overhead);
skip_none - normal = time the early-out actually saves.
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


def timed_pipe(fn, *args, k=8, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(k)]
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
da_max = max(d[0] for d in grid.dims3)
xp_ext, xt_ext = st._pad_coherent(rays.org, rays.dir, rays.tmin,
                                  rays.tmax, n_pad, TILE)
xp_ext = jax.block_until_ready(xp_ext)
BCAP = 7296


@functools.partial(jax.jit, static_argnames=("dims3", "slab", "tile",
                                             "bcap", "mode"))
def frame_mode(xp_ext, xt_ext, bbox_lo, bbox_hi, rs, cols, planes,
               dims3, slab, tile, bcap, mode):
    nt = xp_ext.shape[0] // tile - 1
    cs_tab, n_tab, lo_tab = st._tile_tabs(bbox_lo, bbox_hi, dims3)
    per_ray, per_tile = st._precompute(xp_ext[:nt * tile], cs_tab,
                                       n_tab, lo_tab, bbox_lo, bbox_hi,
                                       tile, planes)
    traceable = xp_ext[:nt * tile, 13].reshape(nt, tile) > 0
    best = (jnp.where(traceable, st._BIG, -st._BIG),
            jnp.full((nt, tile), -1, jnp.int32),
            jnp.zeros((nt, tile), jnp.float32),
            jnp.zeros((nt, tile), jnp.float32))
    ka = per_tile["k0"]
    cols_u = cols.reshape(-1, st._U, 20 * st._G)
    dead_idx = cols_u.shape[0] - 1
    starts, counts, thr = st._plan(per_ray, per_tile, cs_tab, n_tab,
                                   lo_tab, rs, ka, best[0], dims3,
                                   slab, False)
    gidx, tile_of, tminb, n_blocks, demand = st._items(
        starts, counts, thr, nt, slab, bcap, dead_idx)
    if mode == "skip_all":
        tminb = jnp.full_like(tminb, 2 ** 31 - 1)
    elif mode == "skip_none":
        tminb = jnp.full_like(tminb, -1)
    seed = jnp.minimum(best[0],
                       xp_ext[:nt * tile, 13].reshape(nt, tile))
    xt_round = jax.lax.dynamic_update_slice(
        xt_ext,
        jnp.concatenate([seed.reshape(1, -1),
                         jnp.full((1, tile), -st._BIG)], axis=1),
        (14, 0))
    pieces = []
    for goff in range(0, bcap, st._GCHUNK):
        gw = min(st._GCHUNK, bcap - goff)

        def do_gather(gi, gw=gw):
            return cols_u[gi].reshape(gw * 128, 20 * st._G)

        def skip(gi, gw=gw):
            return jnp.zeros((gw * 128, 20 * st._G), jnp.float32)

        pieces.append(jax.lax.cond(
            n_blocks > goff, do_gather, skip,
            gidx[goff * st._UPB:(goff + gw) * st._UPB]))
    g_round = pieces[0] if len(pieces) == 1 else jnp.concatenate(
        pieces, axis=0)
    for off in range(0, bcap, st._CHUNK):
        w = min(st._CHUNK, bcap - off)
        t_c = tile_of[off:off + w]
        tb_c = tminb[off:off + w]
        g_c = jax.lax.slice_in_dim(g_round, off * 128, (off + w) * 128)

        def do_chunk(best, t_c=t_c, tb_c=tb_c, g_c=g_c):
            out_ext = st._sweep(xt_round, g_c, t_c, tb_c, 0, tile,
                                False, False)
            return st._merge(best, out_ext, t_c)

        best = jax.lax.cond(n_blocks > off, do_chunk, lambda b: b, best)
    return best[0].sum() + best[1].sum()


args = (xp_ext, xt_ext, grid.bbox_lo, grid.bbox_hi, grid.rs, grid.cols,
        grid.planes)
for mode in ("normal", "skip_all", "skip_none"):
    t = timed_pipe(functools.partial(
        frame_mode, dims3=grid.dims3, slab=da_max, tile=TILE,
        bcap=BCAP, mode=mode), *args)
    log(f"{mode:10s}: {t * 1e3:7.2f} ms/frame")
