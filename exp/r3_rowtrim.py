#!/usr/bin/env python
"""Measure the per-row column trim: new block demand + frame time."""

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
nt = n_pad // TILE
da_max = max(d[0] for d in grid.dims3)
xp_ext, xt_ext = st._pad_coherent(rays.org, rays.dir, rays.tmin,
                                  rays.tmax, n_pad, TILE)
xp_ext = jax.block_until_ready(xp_ext)


@functools.partial(jax.jit, static_argnames=("dims3", "slab", "tile"))
def demand_probe(xp_ext, bbox_lo, bbox_hi, rs, dims3, slab, tile):
    nt = xp_ext.shape[0] // tile - 1
    cs_tab, n_tab, lo_tab = st._tile_tabs(bbox_lo, bbox_hi, dims3)
    per_ray, per_tile = st._precompute(xp_ext[:nt * tile], cs_tab,
                                       n_tab, lo_tab, bbox_lo, bbox_hi,
                                       tile)
    best = jnp.full((nt, tile), st._BIG, jnp.float32)
    starts, counts, _ = st._plan(per_ray, per_tile, cs_tab, n_tab,
                                 lo_tab, rs, per_tile["k0"], best,
                                 dims3, slab, False)
    cnt2 = counts.reshape(nt, -1)
    tile_pad = -(-cnt2.sum(1) // 128) * 128
    return cnt2.sum(), tile_pad.sum() // 128


tot_g, blocks = jax.device_get(demand_probe(
    xp_ext, grid.bbox_lo, grid.bbox_hi, grid.rs,
    dims3=grid.dims3, slab=da_max, tile=TILE))
log(f"row-trimmed: groups={int(tot_g)} refs={int(tot_g) * 4} "
    f"blocks={int(blocks)}   (was groups=669523 blocks=6271)")

t = timed_pipe(lambda: st.trace_sweep(grid, rays, coherent=True))
log(f"default bmax: {t * 1e3:7.2f} ms/frame = {n / t / 1e6:6.1f} Mrays/s")

cal = max(128, -(-int(int(blocks) * 1.25) // 128) * 128)
t = timed_pipe(lambda: st.trace_sweep(grid, rays, coherent=True,
                                      bmax=cal))
log(f"calibrated bmax={cal}: {t * 1e3:7.2f} ms/frame "
    f"= {n / t / 1e6:6.1f} Mrays/s")

h = st.trace_sweep(grid, rays, coherent=True, bmax=cal)
hitf = float(np.mean(np.asarray(jax.device_get(h.tri_id)) >= 0))
log(f"hit fraction {hitf:.4f}")
