#!/usr/bin/env python
"""Round-4 probe 2: AO-wave demand under fine (24-group minor-sign)
binning x tile size x slab replanning, then a timed AO wave at the
measured budget."""

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
tri_n = grid.tris.n
p, n, found = hit_points_normals(rays, hits, tri_n)
max_dist = float(jnp.max(grid.bbox_hi - grid.bbox_lo)) * 0.1
k = jax.random.split(jax.random.PRNGKey(0), 2)[0]
d = cosine_hemisphere(k, n)
tmax = jnp.where(found, max_dist, 0.0)
sec = integrators._spawn(p, n, d, 0.0, tmax)

ref = None
for fine in (False, True):
    for tile in (512, 256):
        for slab in (None, 8):
            h, ovf, dem = trace_sweep(
                grid, sec, any_hit=True, tile=tile, slab=slab,
                fine_bins=fine, bmax=1024,  # demand probe only
                return_overflow=True, return_demand=True)
            dd = int(jax.device_get(dem))
            occ = np.asarray(h.tri_id >= 0)
            log(f"[ao] fine={int(fine)} tile={tile} slab={slab}: "
                f"peak round demand={dd} blocks "
                f"({dd * 768 * tile / 1e9:.2f}G pair-slots)")

# ground truth occlusion at huge budget, coarse bins (reference result)
h_ref, ovf, _ = trace_sweep(grid, sec, any_hit=True, bmax=24576,
                            fine_bins=False,
                            return_overflow=True, return_demand=True)
occ_ref = np.asarray(h_ref.tri_id >= 0)
log(f"[ao-ref] coarse 24576-budget overflow="
    f"{bool(jax.device_get(ovf))} occ={occ_ref.mean():.4f}")

# fine binning at a real budget: correctness + time
for tile, slab, bmax in ((512, None, 24576), (512, 8, 16384),
                         (256, 8, 24576)):
    def run():
        return trace_sweep(grid, sec, any_hit=True, tile=tile,
                           slab=slab, fine_bins=True, bmax=bmax,
                           return_overflow=True)
    h, ovf = run()
    occ = np.asarray(h.tri_id >= 0)
    jax.block_until_ready(run()[0].t)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run()[0].t)
        ts.append(time.perf_counter() - t0)
    log(f"[ao-run] fine tile={tile} slab={slab} bmax={bmax}: "
        f"{np.median(ts) * 1e3:.1f} ms/wave "
        f"overflow={bool(jax.device_get(ovf))} "
        f"occ={occ.mean():.4f} (ref {occ_ref.mean():.4f}, "
        f"agree={np.mean(occ == occ_ref):.4f})")
