#!/usr/bin/env python
"""Round-4 probe batch 1 (one process, serialized — 1-CPU host):

1. Actual pre-SAT pair totals vs the 2x-tris default capacity (is the
   build paying for slack stream length?).
2. lax.sort cost at the pair-stream scale (how much of the 109 ms
   build is the sort itself).
3. AO wave block demand at tile=512 vs tile=256 (why the generous
   budget overflows; does a narrower tile cut incoherent-wave demand).
"""

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
from hagrid_tpu.ops.segment import sort_pairs
from hagrid_tpu.ops.sweep_trace import trace_sweep
from hagrid_tpu.render import integrators
from hagrid_tpu.render.sampling import cosine_hemisphere, \
    hit_points_normals
from hagrid_tpu.utils import cache

cache.enable()


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, warmup=1, iters=3):
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
log(f"[cap] ref_capacity={grid.ref_capacity} "
    f"total_pairs={int(jax.device_get(grid.total_pairs))} "
    f"total_refs={int(jax.device_get(grid.total_refs))} "
    f"slack={grid.ref_capacity / max(1, int(jax.device_get(grid.total_pairs))):.2f}x")

# 2. sort cost at stream scale
cap = grid.ref_capacity
key = jax.random.randint(jax.random.PRNGKey(0), (cap,), 0,
                         int(np.prod(grid.dims3[0])), jnp.int32)
val = jax.random.randint(jax.random.PRNGKey(1), (cap,), 0, 331732,
                         jnp.int32)


@jax.jit
def do_sort(key, val):
    k, vv = sort_pairs(key, val)
    return k[::997].sum() + vv[::997].sum()


t = timed(do_sort, key, val)
log(f"[sort] {cap} i32 pairs: {t * 1e3:.2f} ms (incl ~24ms sync)")

# 3. AO wave demand, tile 512 vs 256
rays = primary_rays(cam, 1024, 1024, order="block")
hits = trace_sweep(grid, rays, coherent=True)
tri_n = grid.tris.n
p, n, found = hit_points_normals(rays, hits, tri_n)
max_dist = float(jnp.max(grid.bbox_hi - grid.bbox_lo)) * 0.1
key0 = jax.random.PRNGKey(0)
for i, k in enumerate(jax.random.split(key0, 2)):
    d = cosine_hemisphere(k, n)
    tmax = jnp.where(found, max_dist, 0.0)
    sec = integrators._spawn(p, n, d, 0.0, tmax)
    for tile in (512, 256):
        h, ovf, dem = trace_sweep(grid, sec, any_hit=True, tile=tile,
                                  return_overflow=True,
                                  return_demand=True)
        dd = int(jax.device_get(dem))
        log(f"[ao-demand] sample {i} tile={tile}: demand={dd} blocks "
            f"({dd * 128 * 6 * tile // 1000}k pair-slots x{tile}) "
            f"overflow={bool(jax.device_get(ovf))}")

# primary demand at tile 256 for reference
for tile in (512, 256):
    h, ovf, dem = trace_sweep(grid, rays, coherent=True, tile=tile,
                              return_overflow=True, return_demand=True)
    dd = int(jax.device_get(dem))
    t = timed(lambda tl=tile: trace_sweep(grid, rays, coherent=True,
                                          tile=tl).t)
    log(f"[primary] tile={tile}: demand={dd} blocks, "
        f"single-frame {t * 1e3:.2f} ms")
