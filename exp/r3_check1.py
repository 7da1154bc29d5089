#!/usr/bin/env python
"""Measure coherent path + slimmed items: single-frame and pipelined."""

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


def timed(fn, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
grid = build_packet(tris)
rays = primary_rays(cam, 1024, 1024, order="block")
rays = jax.block_until_ready(jax.device_put(rays))
N = rays.count

for coh in (False, True):
    def one(coh=coh):
        return st.trace_sweep(grid, rays, coherent=coh).t
    t = timed(one)
    log(f"coherent={coh}: single {t*1e3:8.2f} ms = {N/t/1e6:6.2f} Mr/s")

    def eight(coh=coh):
        return [st.trace_sweep(grid, rays, coherent=coh).t
                for _ in range(8)]
    t8 = timed(eight, warmup=1, iters=3) / 8
    log(f"coherent={coh}: piped  {t8*1e3:8.2f} ms = {N/t8/1e6:6.2f} Mr/s")

h1 = st.trace_sweep(grid, rays)
h2 = st.trace_sweep(grid, rays, coherent=True)
a, b = np.asarray(h1.tri_id), np.asarray(h2.tri_id)
log(f"binned-vs-coherent id agreement: {(a == b).mean():.6f} "
    f"hit={(b >= 0).mean():.4f}")
