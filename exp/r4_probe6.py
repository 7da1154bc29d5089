#!/usr/bin/env python
"""Round-4 probe 6: tile=128 demand for the sorted AO wave (near-origin
cells dominate incoherent demand; smaller tiles shrink origin boxes).
Also primary demand at tile=128 for reference."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hagrid_tpu import scenes
from hagrid_tpu.core.camera import primary_rays
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.grid.packet import build_packet
from hagrid_tpu.ops import sortrays
from hagrid_tpu.ops.sweep_trace import trace_sweep
from hagrid_tpu.render import integrators
from hagrid_tpu.render.sampling import cosine_hemisphere, \
    hit_points_normals
from hagrid_tpu.utils import cache

cache.enable()


def log(*a):
    print(*a, flush=True)


v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
grid = build_packet(tris)
rays = primary_rays(cam, 1024, 1024, order="block")
hits = trace_sweep(grid, rays, coherent=True)
p, n, found = hit_points_normals(rays, hits, grid.tris.n)
max_dist = float(jnp.max(grid.bbox_hi - grid.bbox_lo)) * 0.1
k = jax.random.split(jax.random.PRNGKey(0), 2)[0]
d = cosine_hemisphere(k, n)
tmax = jnp.where(found, max_dist, 0.0)
sec = integrators._spawn(p, n, d, 0.0, tmax)
srt, perm = sortrays.sort_rays(sec, grid.bbox_lo, grid.bbox_hi,
                               bits=10, origin_major=True)

for tile, rmax in ((128, 16), (128, 32)):
    h, ovf, dm = trace_sweep(grid, srt, any_hit=True, tile=tile,
                             slab=8, rmax=rmax, bmax=1024,
                             return_overflow=True, return_demand=True)
    dd = int(jax.device_get(dm))
    log(f"[t128] AO tile={tile} rmax={rmax}: demand={dd} blocks "
        f"({dd * 768 * tile / 1e9:.2f}G pair-slots)")

h, ovf, dm = trace_sweep(grid, rays, coherent=True, tile=128,
                         bmax=1024, return_overflow=True,
                         return_demand=True)
dd = int(jax.device_get(dm))
log(f"[t128] primary tile=128 rmax=4: demand={dd} blocks "
    f"({dd * 768 * 128 / 1e9:.2f}G pair-slots)")
