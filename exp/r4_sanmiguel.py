#!/usr/bin/env python
"""San Miguel vs Sponza on the round-4 sweep path: demand (gathered
refs), frame time, rebuild time. The r3 VERDICT pinned SM gathered refs
at 3.5x Sponza ('structural'); this re-measures after the 24-ref units,
row trims and clamp-dedup."""

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


def timed8(fn, warmup=1, iters=3):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(8)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / 8)
    return float(np.median(ts))


def timed1(fn, warmup=1, iters=5):
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
    t0 = time.perf_counter()
    grid = build_packet(tris)
    log(f"[{name}] {len(f)} tris dims3={grid.dims3} "
        f"cap={grid.ref_capacity} first build {time.perf_counter()-t0:.1f}s")
    rays = primary_rays(cam, 1024, 1024, order="block")
    rays = jax.block_until_ready(jax.device_put(rays))
    n = rays.count
    h, ovf, dem = st.trace_sweep(grid, rays, coherent=True,
                                 return_overflow=True, return_demand=True)
    d = int(jax.device_get(dem))
    hitf = float(np.mean(np.asarray(h.tri_id) >= 0))
    log(f"[{name}] demand={d} blocks = {d * st._BREF / 1e6:.2f}M ref "
        f"slots ({d * st._BREF / n:.2f}/ray) ovf={bool(jax.device_get(ovf))} "
        f"hit={hitf:.4f}")
    cal = max(256, -(-int(d * 1.3) // 1024) * 1024)
    tp = timed8(lambda: st.trace_sweep(grid, rays, coherent=True,
                                       bmax=cal))
    ts = timed1(lambda: st.trace_sweep(grid, rays, coherent=True,
                                       bmax=cal))
    log(f"[{name}] pipelined {tp*1e3:7.2f} ms ({n/tp/1e6:6.1f} Mrays/s) "
        f"single {ts*1e3:7.2f} ms ({n/ts/1e6:6.1f} Mrays/s)")
    tb = timed1(lambda: build_packet(
        tris, dims3=grid.dims3, ref_capacity=grid.ref_capacity,
        bbox=(np.asarray(grid.bbox_lo), np.asarray(grid.bbox_hi)),
        check=False).total_refs)
    log(f"[{name}] warm rebuild {tb*1e3:.1f} ms")
