#!/usr/bin/env python
"""Round-3 frame decomposition on the real TPU.

Questions:
  1. Real block demand per round (how much of bmax is live)?
  2. Where does the 159 ms go: plan, gather, sweep?
  3. How do tile (512/256/128) and slab (16/8/4) change demand + time?

Run:  python exp/r3_decompose.py
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


# --- scene + grid (honest-timing poison happens inside build check) ---
v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
grid = build_packet(tris)
log(f"grid dims3={grid.dims3} ref_capacity={grid.ref_capacity} "
    f"refs={int(jax.device_get(grid.total_refs))}")

W = H = 1024
rays = primary_rays(cam, W, H, order="block")
rays = jax.block_until_ready(jax.device_put(rays))
N = rays.count


# --- demand per round: replicate the plan loop, return demands --------
@functools.partial(jax.jit, static_argnames=("dims3", "slab", "tile",
                                             "max_rounds", "nt"))
def demand_probe(xp_ext, bbox_lo, bbox_hi, rs, dims3, slab, tile,
                 max_rounds, nt):
    cs_tab, n_tab, lo_tab = st._tile_tabs(bbox_lo, bbox_hi, dims3)
    per_ray, per_tile = st._precompute(xp_ext[:nt * tile], cs_tab,
                                       n_tab, lo_tab, bbox_lo, bbox_hi,
                                       tile)
    best_t = jnp.full((nt, tile), st._BIG, jnp.float32)
    ka = per_tile["k0"]
    step = per_tile["step"]
    demands = []
    totals = []
    for _ in range(max_rounds):
        starts, counts, _thr = st._plan(per_ray, per_tile, cs_tab,
                                        n_tab, lo_tab, rs, ka, best_t,
                                        dims3, slab, False)
        cnt2 = counts.reshape(nt, -1)
        tile_tot = cnt2.sum(1)
        tile_pad = -(-tile_tot // 128) * 128
        demands.append(tile_pad.sum())          # padded groups
        totals.append(tile_tot.sum())           # raw groups
        ka = ka + step * slab
    return jnp.stack(demands), jnp.stack(totals)


for tile in (512, 256, 128):
    n_pad = (-(-N // tile) + 6) * tile
    nt = n_pad // tile - 1
    xp_ext, xt_ext, inv = st._bin_rays(rays.org, rays.dir, rays.tmin,
                                       rays.tmax, n_pad, tile)
    for slab in (16, 8):
        max_rounds = -(-max(d[0] for d in grid.dims3) // slab) + 1
        dem, tot = jax.device_get(demand_probe(
            xp_ext, grid.bbox_lo, grid.bbox_hi, grid.rs, grid.dims3,
            slab, tile, max_rounds, nt))
        # NOTE: demand here ignores within-frame termination (best_t
        # stays BIG), so it is an upper bound for rounds >= 2.
        blocks = dem // 128
        log(f"tile={tile} slab={slab} nt={nt} rounds={max_rounds} "
            f"blocks/round(NO-term)={list(blocks)} "
            f"raw_groups={list(tot)}")

# --- full frame timing at variants ------------------------------------
log("\n--- full trace_sweep timings (per-frame sync included) ---")
for tile in (512, 256, 128):
    for slab in (16, 8):
        def run(tile=tile, slab=slab):
            h, ovf = st.trace_sweep(grid, rays, tile=tile, slab=slab,
                                    return_overflow=True)
            return h.t
        try:
            t = timed(run, warmup=2, iters=3)
            h, ovf = st.trace_sweep(grid, rays, tile=tile, slab=slab,
                                    return_overflow=True)
            ovf = bool(jax.device_get(ovf))
            log(f"tile={tile} slab={slab}: {t*1e3:8.2f} ms = "
                f"{N/t/1e6:6.2f} Mrays/s  ovf={ovf}")
        except Exception as e:
            log(f"tile={tile} slab={slab}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")

# --- pipelined throughput: 8 frames, one sync -------------------------
log("\n--- pipelined (8 frames back-to-back, one sync) ---")
def run8():
    outs = []
    for i in range(8):
        h = st.trace_sweep(grid, rays)
        outs.append(h.t)
    return outs
t8 = timed(run8, warmup=1, iters=3)
log(f"default tile=512 slab=16: {t8/8*1e3:.2f} ms/frame pipelined = "
    f"{8*N/t8/1e6:.2f} Mrays/s")
