#!/usr/bin/env python
"""Measure the 32-ref unit-gather frame: demand, time, hit fraction."""

import functools
import os
import sys
import time

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

h, ovf, demand = st.trace_sweep(grid, rays, coherent=True,
                                return_overflow=True, return_demand=True)
d = int(jax.device_get(demand))
hitf = float(np.mean(np.asarray(jax.device_get(h.tri_id)) >= 0))
log(f"unit-gather: demand={d} blocks (refs ~{d * 512}), "
    f"ovf={bool(jax.device_get(ovf))}, hit={hitf:.4f}")

t = timed_pipe(lambda: st.trace_sweep(grid, rays, coherent=True))
log(f"default bmax: {t * 1e3:7.2f} ms/frame = {n / t / 1e6:6.1f} Mrays/s")

cal = max(128, -(-int(d * 13) // 1280) * 128)  # 1.3x margin
t = timed_pipe(lambda: st.trace_sweep(grid, rays, coherent=True,
                                      bmax=cal))
log(f"calibrated bmax={cal}: {t * 1e3:7.2f} ms/frame "
    f"= {n / t / 1e6:6.1f} Mrays/s")
