#!/usr/bin/env python
"""Round-4: timed compact AO wave (tile 256 vs 128) + agreement vs the
dense full-budget reference + primary-compact exactness at scale.
(Follow-up to r4_v2check.py, which timed out after the demand probes.)"""

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
p, nn, found = hit_points_normals(rays, hits, grid.tris.n)
max_dist = float(jnp.max(grid.bbox_hi - grid.bbox_lo)) * 0.1
k = jax.random.split(jax.random.PRNGKey(0), 2)[0]
dd_ = cosine_hemisphere(k, nn)
tmax = jnp.where(found, max_dist, 0.0)
sec = integrators._spawn(p, nn, dd_, 0.0, tmax)
srt, perm = sortrays.sort_rays(sec, grid.bbox_lo, grid.bbox_hi,
                               bits=10, origin_major=True)

# dense full-budget reference (cached compile from r4_v2check)
h_ref, ovf = trace_sweep(grid, sec, any_hit=True, bmax=196608,
                         compact=False, fine_bins=False,
                         return_overflow=True)
occ_ref = np.asarray(h_ref.tri_id >= 0)
log(f"[ao-ref] occ={occ_ref.mean():.4f} "
    f"overflow={bool(jax.device_get(ovf))}")

# measured demands from r4_v2check (identical wave, PRNGKey(0)):
CFG = {256: (59400, 257590), 128: (87757, 427484)}
for tile in (256, 128):
    dd, rr = CFG[tile]
    bmax = max(1024, -(-int(dd * 1.25) // 1024) * 1024)
    rowmax = max(8192, int(rr * 1.25))

    def run():
        h, ovf = trace_sweep(grid, srt, any_hit=True, tile=tile,
                             slab=8, compact=True, bmax=bmax,
                             rowmax=rowmax, return_overflow=True)
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
    log(f"[ao-compact] tile={tile} bmax={bmax} rowmax={rowmax}: "
        f"{np.median(ts) * 1e3:.1f} ms/wave "
        f"overflow={bool(jax.device_get(ovf))} occ={occ.mean():.4f} "
        f"ref={occ_ref.mean():.4f} agree={np.mean(occ == occ_ref):.4f}")

# primaries via compact (closest-hit exactness at scale)
h_c, ovf, dm = trace_sweep(grid, rays, coherent=True, compact=True,
                           return_overflow=True, return_demand=True)
h_d = trace_sweep(grid, rays, coherent=True)
agree = np.mean(np.asarray(h_c.tri_id) == np.asarray(h_d.tri_id))
dmv = jax.device_get(dm)
log(f"[primary-compact] demand={int(dmv[0])} rows={int(dmv[1])} "
    f"agree_vs_dense={agree:.6f}")
