#!/usr/bin/env python
"""Histogram of planned ref-range lengths (group rows) on Sponza.

Decides whether the gather unit can be coarsened to 8-group (32-ref)
tiles for in-kernel DMA: rounding every range outward to 8-row
boundaries costs <= 14 extra rows per range; worth it only if ranges
are long enough.
"""

import sys

import os

import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
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

v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
grid = build_packet(tris)
rays = primary_rays(cam, 1024, 1024, order="block")
TILE = 512
n = rays.count
n_pad = -(-n // TILE) * TILE
da_max = max(d[0] for d in grid.dims3)

xp_ext, xt_ext = st._pad_coherent(rays.org, rays.dir, rays.tmin,
                                  rays.tmax, n_pad, TILE)


@jax.jit
def plan_stats(xp_ext):
    nt = xp_ext.shape[0] // TILE - 1
    cs_tab, n_tab, lo_tab = st._tile_tabs(grid.bbox_lo, grid.bbox_hi,
                                          grid.dims3)
    per_ray, per_tile = st._precompute(xp_ext[:nt * TILE], cs_tab,
                                       n_tab, lo_tab, grid.bbox_lo,
                                       grid.bbox_hi, TILE, grid.planes)
    traceable = xp_ext[:nt * TILE, 13].reshape(nt, TILE) > 0
    best0 = jnp.where(traceable, st._BIG, -st._BIG)
    ka = per_tile["k0"]
    starts, counts, thr = st._plan(per_ray, per_tile, cs_tab, n_tab,
                                   lo_tab, grid.rs, ka, best0,
                                   grid.dims3, da_max, False)
    return starts, counts


starts, counts = plan_stats(xp_ext)
cnt = np.asarray(counts)
nz = cnt[cnt > 0]
print(f"ranges: {len(nz)} nonzero of {len(cnt)} slots")
print(f"group rows total: {nz.sum()} (refs {4 * nz.sum()})")
print(f"range rows: mean {nz.mean():.1f} median {np.median(nz):.0f} "
      f"p90 {np.percentile(nz, 90):.0f} max {nz.max()}")
st8 = np.asarray(starts)[cnt > 0]
lo8 = st8 // 8 * 8
hi8 = -(-(st8 + nz) // 8) * 8
print(f"rounded to 8-row tiles: {int((hi8 - lo8).sum())} rows "
      f"({(hi8 - lo8).sum() / nz.sum():.2f}x)")
lo4 = st8 // 4 * 4
hi4 = -(-(st8 + nz) // 4) * 4
print(f"rounded to 4-row tiles: {int((hi4 - lo4).sum())} rows "
      f"({(hi4 - lo4).sum() / nz.sum():.2f}x)")
hist, edges = np.histogram(nz, bins=[1, 2, 3, 5, 9, 17, 33, 65, 1 << 20])
for h, e0, e1 in zip(hist, edges[:-1], edges[1:]):
    print(f"  len [{e0:>4},{e1:>4}): {h:>8} ranges, "
          f"{int((nz[(nz >= e0) & (nz < e1)]).sum()):>8} rows")
