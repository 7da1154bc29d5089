#!/usr/bin/env python
"""Round-4 probe 3: AO-wave demand with ORIGIN-MAJOR ray sorting.

Hypothesis (after probe2 killed direction sub-binning): the AO frustum
blowup is per-tile origin DEPTH spread — hit points of one image block
lie at any depth, so tile origin boxes span the scene. Sorting rays by
fine origin Morton (direction handled by the downstream axis/sign
binning) should make origin boxes tile-tight.

Also captures a trustworthy reference occlusion (budget >= true demand)
and a timed sorted-wave run at a realistic budget."""

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

# Trustworthy reference: budget comfortably above the measured 174k
# demand. Slow (one-off).
h_ref, ovf, dem = trace_sweep(grid, sec, any_hit=True, bmax=196608,
                              fine_bins=False, return_overflow=True,
                              return_demand=True)
occ_ref = np.asarray(h_ref.tri_id >= 0)
log(f"[ref] demand={int(jax.device_get(dem))} "
    f"overflow={bool(jax.device_get(ovf))} occ={occ_ref.mean():.4f}")

for bits in (5, 8, 10):
    srt, perm = sortrays.sort_rays(sec, grid.bbox_lo, grid.bbox_hi,
                                   bits=bits, origin_major=True)
    for slab in (None, 8):
        h, ovf, dm = trace_sweep(grid, srt, any_hit=True, slab=slab,
                                 fine_bins=False, bmax=1024,
                                 return_overflow=True,
                                 return_demand=True)
        dd = int(jax.device_get(dm))
        log(f"[sorted] bits={bits} slab={slab}: peak demand={dd} blocks "
            f"({dd * 768 * 512 / 1e9:.2f}G pair-slots)")

# Timed + correctness at a calibrated budget for the best setting.
bits = 10
srt, perm = sortrays.sort_rays(sec, grid.bbox_lo, grid.bbox_hi,
                               bits=bits, origin_major=True)
h, ovf, dm = trace_sweep(grid, srt, any_hit=True, bmax=1024,
                         fine_bins=False, return_overflow=True,
                         return_demand=True)
dd = int(jax.device_get(dm))
bmax = max(1024, -(-int(dd * 1.3) // 1024) * 1024)
log(f"[run] bits=10 demand={dd} -> bmax={bmax}")


def run():
    srt, perm = sortrays.sort_rays(sec, grid.bbox_lo, grid.bbox_hi,
                                   bits=bits, origin_major=True)
    h, ovf = trace_sweep(grid, srt, any_hit=True, bmax=bmax,
                         fine_bins=False, return_overflow=True)
    occ_s = sortrays.unsort(h.tri_id, perm)
    return occ_s, ovf


occ_s, ovf = run()
occ = np.asarray(occ_s >= 0)
jax.block_until_ready(run()[0])
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(run()[0])
    ts.append(time.perf_counter() - t0)
log(f"[run] sorted wave: {np.median(ts) * 1e3:.1f} ms "
    f"(sort+trace+unsort) overflow={bool(jax.device_get(ovf))} "
    f"occ={occ.mean():.4f} ref={occ_ref.mean():.4f} "
    f"agree={np.mean(occ == occ_ref):.4f}")

# Unsorted wave at the same generous budget for a like-for-like time.
def run_unsorted():
    h, ovf = trace_sweep(grid, sec, any_hit=True, bmax=196608,
                         fine_bins=False, return_overflow=True)
    return h.tri_id, ovf


jax.block_until_ready(run_unsorted()[0])
ts = []
for _ in range(2):
    t0 = time.perf_counter()
    jax.block_until_ready(run_unsorted()[0])
    ts.append(time.perf_counter() - t0)
log(f"[run] UNSORTED full-budget wave: {np.median(ts) * 1e3:.1f} ms")
