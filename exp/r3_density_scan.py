#!/usr/bin/env python
"""Scan packet-grid densities: cross-section resolution vs frame time.

Hypothesis: cross_density=0.4 makes frustum rects quantize to few large
cells (2-4x over-coverage); finer cross-sections trim gathered refs
faster than ref duplication grows."""

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


def timed(fn, *args, warmup=2, iters=3):
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
rays = primary_rays(cam, 1024, 1024, order="block")
rays = jax.block_until_ready(jax.device_put(rays))
N = rays.count

for cross in (0.4, 1.0, 2.0, 4.0):
    for slice_d in (0.02, 0.08):
        try:
            grid = build_packet(tris, cross_density=cross,
                                slice_density=slice_d)
            refs = int(jax.device_get(grid.total_refs))

            def run():
                h, _ = st.trace_sweep(grid, rays, return_overflow=True)
                return h.t

            t = timed(run)
            h, ovf = st.trace_sweep(grid, rays, return_overflow=True)
            ovf = bool(jax.device_get(ovf))
            hitf = float(np.mean(np.asarray(
                jax.device_get(h.tri_id)) >= 0))
            log(f"cross={cross} slice={slice_d}: dims3={grid.dims3} "
                f"refs={refs} cap={grid.ref_capacity} "
                f"{t*1e3:8.2f} ms = {N/t/1e6:6.2f} Mrays/s "
                f"ovf={ovf} hit={hitf:.3f}")
        except Exception as e:
            log(f"cross={cross} slice={slice_d}: FAILED "
                f"{type(e).__name__}: {str(e)[:160]}")
