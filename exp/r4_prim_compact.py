#!/usr/bin/env python
"""Round-4: does the compact row-stream planner pay on COHERENT
primaries? Dense tile=512 demand is 5776 blocks; compact trims every
row (no untrimmed tail) and measured 4939 blocks. Scan (compact, tile,
slab) frame times on the Sponza primary wave, exactness-gated vs the
current dense default."""

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


def timeit(fn, iters=4):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


configs = [
    # (compact, tile, slab, bmax, rowmax)
    (False, 512, None, None, None),            # current default
    (True, 512, None, 8192, 1 << 17),          # compact whole-grid
    (True, 512, 8, 8192, 1 << 17),             # compact slab-replanned
    (True, 256, None, 16384, 1 << 18),
    (True, 256, 8, 16384, 1 << 18),
]
for compact, tile, slab, bmax, rowmax in configs:
    kw = dict(coherent=True, compact=compact, tile=tile, slab=slab,
              bmax=bmax, rowmax=rowmax)
    h, ovf, dm = trace_sweep(grid, rays, return_overflow=True,
                             return_demand=True, **kw)
    dmv = jax.device_get(dm)
    agree = float(np.mean(np.asarray(h.tri_id) == ref_id))
    ms = timeit(lambda kw=kw: trace_sweep(grid, rays, **kw))
    log(f"[prim] compact={int(compact)} tile={tile} slab={slab}: "
        f"{ms:.1f} ms demand={int(dmv[0])} rows={int(dmv[1])} "
        f"ovf={bool(jax.device_get(ovf))} agree={agree:.6f}")
