#!/usr/bin/env python
"""Round-4 follow-up: compact coherent primaries with CALIBRATED
budgets (the first scan ran rowmax 3.8x over the live rows and bmax
4x over demand; both planner stages scale with the caps, not the live
work). Session-style calibration: bmax = demand*1.3, rowmax =
rows*1.3."""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from hagrid_tpu import scenes
from hagrid_tpu.core.camera import primary_rays
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.grid.packet import build_packet
from hagrid_tpu.ops.sweep_trace import trace_sweep
from hagrid_tpu.utils import cache

cache.enable()


def log(*a):
    print(*a, flush=True)


v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
grid = build_packet(tris)
rays = primary_rays(cam, 1024, 1024, order="block")

ref = trace_sweep(grid, rays, coherent=True)
ref_id = np.asarray(ref.tri_id)


def timeit(fn, iters=5):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def timeit_pipe(fn, k=8, iters=3):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(k)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / k)
    return float(np.median(ts)) * 1e3


for tile, dm0, rows0 in ((512, 2002, 34188), (256, 3320, 68002)):
    bmax = -(-int(dm0 * 1.3) // 128) * 128
    rowmax = -(-int(rows0 * 1.3) // 1024) * 1024
    kw = dict(coherent=True, compact=True, tile=tile, bmax=bmax,
              rowmax=rowmax)
    h, ovf = trace_sweep(grid, rays, return_overflow=True, **kw)
    agree = float(np.mean(np.asarray(h.tri_id) == ref_id))
    ms = timeit(lambda kw=kw: trace_sweep(grid, rays, **kw))
    msp = timeit_pipe(lambda kw=kw: trace_sweep(grid, rays, **kw))
    log(f"[prim-cal] tile={tile} bmax={bmax} rowmax={rowmax}: "
        f"{ms:.1f} ms single / {msp:.1f} ms pipelined "
        f"ovf={bool(jax.device_get(ovf))} agree={agree:.6f}")

# dense calibrated baseline for the same comparison
bmax = -(-int(4939 * 1.3) // 128) * 128
kw = dict(coherent=True, compact=False, tile=512, bmax=bmax)
ms = timeit(lambda: trace_sweep(grid, rays, **kw))
msp = timeit_pipe(lambda: trace_sweep(grid, rays, **kw))
log(f"[prim-cal] dense tile=512 bmax={bmax}: {ms:.1f} ms single / "
    f"{msp:.1f} ms pipelined")
