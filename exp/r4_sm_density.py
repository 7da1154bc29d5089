#!/usr/bin/env python
"""Decide the round-4 adaptivity approach (VERDICT r3 #5): does simply
refining the packet cross-section fix San Miguel's 3.5x gathered-refs
ratio, and what does it cost in pairs (capacity/build) — or is per-row
adaptive column placement structurally required?

For each cross_density: build, record dims3 / pair capacity / SAT refs,
then plan-only primary demand (blocks) and single-frame time.
"""

import sys
import time

import jax
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


def timed1(fn, iters=5):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


for name in ("sponza", "san_miguel"):
    v, f, cam = scenes.load_scene(name)
    tris = Triangles.from_mesh(v, f)
    rays = primary_rays(cam, 1024, 1024, order="block")
    rays = jax.block_until_ready(jax.device_put(rays))
    n = rays.count
    for cross in (0.4, 0.8, 1.6, 3.2):
        t0 = time.perf_counter()
        grid = build_packet(tris, cross_density=cross)
        tb = time.perf_counter() - t0
        pairs = int(jax.device_get(grid.total_pairs))
        refs = int(jax.device_get(grid.total_refs))
        h, ovf, dem = st.trace_sweep(grid, rays, coherent=True,
                                     return_overflow=True,
                                     return_demand=True)
        d = int(jax.device_get(dem))
        hitf = float(np.mean(np.asarray(jax.device_get(h.tri_id)) >= 0))
        cal = max(256, -(-int(d * 1.3) // 1024) * 1024)
        ts = timed1(lambda: st.trace_sweep(grid, rays, coherent=True,
                                           bmax=cal))
        log(f"[{name} cross={cross}] dims3={grid.dims3} "
            f"cap={grid.ref_capacity} pairs={pairs} refs={refs} "
            f"demand={d}blk ({d * st._BREF / n:.2f} ref/ray) "
            f"hit={hitf:.4f} build={tb:.1f}s "
            f"frame={ts * 1e3:.2f}ms ({n / ts / 1e6:.1f} Mrays/s)")
