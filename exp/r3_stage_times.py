#!/usr/bin/env python
"""Time the non-kernel stages: bin, plan, items, gather, unbin; and the
marginal cost of extra pallas launches inside one executable."""

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
n_pad = (-(-N // tile) + 6) * tile
nt = n_pad // tile - 1
bmax = 12288

xp_ext, xt_ext, inv = st._bin_rays(rays.org, rays.dir, rays.tmin,
                                   rays.tmax, n_pad, tile)
jax.block_until_ready(xp_ext)

t = timed(lambda: st._bin_rays(rays.org, rays.dir, rays.tmin, rays.tmax,
                               n_pad, tile)[0])
log(f"bin_rays: {t*1e3:.2f} ms")


@functools.partial(jax.jit, static_argnames=("what", "rounds"))
def stages(xp_ext, bbox_lo, bbox_hi, rs, cols, what, rounds=3):
    cs_tab, n_tab, lo_tab = st._tile_tabs(bbox_lo, bbox_hi, grid.dims3)
    per_ray, per_tile = st._precompute(xp_ext[:nt * tile], cs_tab,
                                       n_tab, lo_tab, bbox_lo, bbox_hi,
                                       tile)
    best_t = jnp.full((nt, tile), st._BIG, jnp.float32)
    ka = per_tile["k0"]
    step = per_tile["step"]
    cols_g = cols.reshape(-1, 16 * st._G)
    dead_idx = cols_g.shape[0] - 1
    acc = jnp.float32(0)
    for _ in range(rounds):
        starts, counts, thr = st._plan(per_ray, per_tile, cs_tab,
                                       n_tab, lo_tab, rs, ka, best_t,
                                       grid.dims3, slab, False)
        if what == "plan":
            acc += starts.sum() + counts.sum()
        else:
            gidx, tile_of, tminb, n_blocks, demand = st._items(
                starts, counts, thr, nt, slab, bmax, dead_idx)
            if what == "items":
                acc += gidx.sum() + tile_of.sum() + demand
            else:  # gather
                g_round = jnp.zeros((bmax * 128, 16 * st._G),
                                    jnp.float32)
                for goff in range(0, bmax, st._GCHUNK):
                    gw = min(st._GCHUNK, bmax - goff)

                    def do(g, goff=goff, gw=gw):
                        piece = cols_g[gidx[goff * 128:(goff + gw)
                                            * 128]]
                        return jax.lax.dynamic_update_slice(
                            g, piece, (goff * 128, 0))
                    g_round = jax.lax.cond(n_blocks > goff, do,
                                           lambda g: g, g_round)
                acc += g_round.sum()
        ka = ka + step * slab
    return acc


for what in ("plan", "items", "gather"):
    t = timed(stages, xp_ext, grid.bbox_lo, grid.bbox_hi, grid.rs,
              grid.cols, what)
    log(f"{what} x3 rounds (cumulative pipeline): {t*1e3:.2f} ms")

# marginal pallas launch cost: k launches of 1024 dead blocks in one jit
xt_small = xt_ext[:, :65 * tile]


@functools.partial(jax.jit, static_argnames=("k",))
def klaunch(xt, g, tof, k):
    acc = jnp.float32(0)
    tb = jnp.zeros_like(tof)
    for i in range(k):
        out = st._sweep(xt, g, tof + i * 0, tb, 0, tile, False)
        acc += out[0, 0]
    return acc


g1 = jnp.zeros((1024 * 128, 16 * st._G), jnp.float32)
tof_dead = jnp.full((1024,), 64, jnp.int32)
t1 = timed(klaunch, xt_small, g1, tof_dead, 1)
t4 = timed(klaunch, xt_small, g1, tof_dead, 4)
t12 = timed(klaunch, xt_small, g1, tof_dead, 12)
log(f"1 launch {t1*1e3:.2f} ms, 4: {t4*1e3:.2f}, 12: {t12*1e3:.2f} "
    f"-> marginal {1e3*(t12-t4)/8:.3f} ms/launch (1024 dead blocks)")
