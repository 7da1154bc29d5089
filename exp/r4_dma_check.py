#!/usr/bin/env python
"""In-kernel DMA gather: correctness vs the XLA-gather path + timing.
Run on TPU."""

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


def timed_single(fn, warmup=1, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# Small scene first: exact agreement gate.
v, f = scenes.sponza_like(20000)
tris = Triangles.from_mesh(v, f)
grid = build_packet(tris)
cam = scenes.sponza_camera()
rays = primary_rays(cam, 128, 128, order="block")
h_ref = st.trace_sweep(grid, rays, coherent=True, dma=False)
h_dma = st.trace_sweep(grid, rays, coherent=True, dma=True)
id_r = np.asarray(h_ref.tri_id)
id_d = np.asarray(h_dma.tri_id)
t_r = np.asarray(h_ref.t)
t_d = np.asarray(h_dma.t)
same = (id_r == id_d)
tok = np.isclose(t_r, t_d, rtol=1e-6, atol=1e-7) | (
    (id_r < 0) & (id_d < 0))
log(f"[small] id agree {same.mean():.6f}  t agree {tok.mean():.6f} "
    f"hits {(id_r >= 0).mean():.4f}")
if same.mean() < 1.0:
    bad = np.where(~same)[0][:10]
    log("disagreements:", [(int(i), int(id_r[i]), int(id_d[i]),
                            float(t_r[i]), float(t_d[i])) for i in bad])
    sys.exit(1)

# Any-hit path too.
a_ref = st.trace_sweep(grid, rays, coherent=True, any_hit=True, dma=False)
a_dma = st.trace_sweep(grid, rays, coherent=True, any_hit=True, dma=True)
agree_a = ((np.asarray(a_ref.tri_id) >= 0)
           == (np.asarray(a_dma.tri_id) >= 0)).mean()
log(f"[small] any-hit found-agree {agree_a:.6f}")

# Full Sponza timing.
v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
grid = build_packet(tris)
rays = primary_rays(cam, 1024, 1024, order="block")
rays = jax.block_until_ready(jax.device_put(rays))
n = rays.count

h0, ovf0, dem = st.trace_sweep(grid, rays, coherent=True, dma=True,
                               return_overflow=True, return_demand=True)
d = int(jax.device_get(dem))
log(f"[sponza] demand={d} ovf={bool(jax.device_get(ovf0))} "
    f"hit={float(np.mean(np.asarray(h0.tri_id) >= 0)):.4f}")
cal = max(256, -(-int(d * 1.3) // 128) * 128)

# Cross-check at scale on 1M rays: sampled agreement.
h1 = st.trace_sweep(grid, rays, coherent=True, dma=False, bmax=cal)
h2 = st.trace_sweep(grid, rays, coherent=True, dma=True, bmax=cal)
sa = (np.asarray(h1.tri_id) == np.asarray(h2.tri_id)).mean()
log(f"[sponza] dma-vs-gather id agreement {sa:.6f}")

for name, dma in (("gather", False), ("dma", True)):
    tp = timed_pipe(lambda dma=dma: st.trace_sweep(
        grid, rays, coherent=True, bmax=cal, dma=dma))
    ts = timed_single(lambda dma=dma: st.trace_sweep(
        grid, rays, coherent=True, bmax=cal, dma=dma))
    log(f"[sponza] {name:6s}: pipelined {tp * 1e3:7.2f} ms "
        f"({n / tp / 1e6:6.1f} Mrays/s)  single {ts * 1e3:7.2f} ms "
        f"({n / ts / 1e6:6.1f} Mrays/s)")
