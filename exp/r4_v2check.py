#!/usr/bin/env python
"""Round-4: validate the compacted row-stream planner (_plan_items2).

1. Small random scene: compact vs dense vs brute oracle, closest +
   any-hit (exactness).
2. Sponza AO wave: compact demand (tile 512/256/128), agreement vs the
   dense full-budget reference, and a timed compact wave.
3. Sponza primaries via compact (closest-hit path exactness at scale).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hagrid_tpu import scenes
from hagrid_tpu.core.camera import primary_rays
from hagrid_tpu.core.types import Rays, Triangles
from hagrid_tpu.grid.packet import build_packet
from hagrid_tpu.ops import sortrays
from hagrid_tpu.ops.sweep_trace import trace_sweep
from hagrid_tpu.oracle import closest_hit
from hagrid_tpu.render import integrators
from hagrid_tpu.render.sampling import cosine_hemisphere, \
    hit_points_normals
from hagrid_tpu.utils import cache

cache.enable()


def log(*a):
    print(*a, flush=True)


# ---- 1. small-scene exactness ------------------------------------------
rng = np.random.default_rng(0)
n = 300
v0 = rng.uniform(0, 1, (n, 3)).astype(np.float32)
e1 = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
e2 = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
tris = Triangles(v0=jnp.asarray(v0), e1=jnp.asarray(e1),
                 e2=jnp.asarray(e2),
                 n=jnp.cross(jnp.asarray(e1), jnp.asarray(e2)))
g = build_packet(tris, dims=(6, 6, 6))
m = 1024
org = rng.uniform(-0.2, 1.2, (m, 3)).astype(np.float32)
d = rng.normal(size=(m, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
rays = Rays(org=jnp.asarray(org), dir=jnp.asarray(d),
            tmin=jnp.zeros(m), tmax=jnp.full((m,), 1e30, jnp.float32))
ho = closest_hit(rays, tris)
for compact in (False, True):
    h = trace_sweep(g, rays, compact=compact)
    ok = np.mean(np.asarray(h.tri_id) == np.asarray(ho.tri_id))
    okt = np.allclose(np.asarray(h.t)[np.asarray(ho.tri_id) >= 0],
                      np.asarray(ho.t)[np.asarray(ho.tri_id) >= 0],
                      rtol=1e-5)
    ha = trace_sweep(g, rays, any_hit=True, compact=compact)
    oka = np.mean((np.asarray(ha.tri_id) >= 0)
                  == (np.asarray(ho.tri_id) >= 0))
    log(f"[small] compact={int(compact)}: closest agree={ok:.4f} "
        f"t close={okt} anyhit agree={oka:.4f}")

# ---- 2. Sponza AO wave -------------------------------------------------
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

occ_ref = None
for tile in (512, 256, 128):
    h, ovf, dm = trace_sweep(grid, srt, any_hit=True, tile=tile,
                             slab=8, compact=True, bmax=1024,
                             rowmax=1 << 21,
                             return_overflow=True, return_demand=True)
    dmv = jax.device_get(dm)
    dd, rr = int(dmv[0]), int(dmv[1])
    log(f"[ao-compact] tile={tile}: demand={dd} blocks "
        f"({dd * 768 * tile / 1e9:.2f}G pair-slots), rows={rr}")

# dense full-budget reference (compiled earlier rounds: bmax=196608)
h_ref, ovf, _ = trace_sweep(grid, sec, any_hit=True, bmax=196608,
                            compact=False, fine_bins=False,
                            return_overflow=True, return_demand=True)
occ_ref = np.asarray(h_ref.tri_id >= 0)
log(f"[ao-ref] dense full-budget occ={occ_ref.mean():.4f} "
    f"overflow={bool(jax.device_get(ovf))}")

tile = 256
h, ovf, dm = trace_sweep(grid, srt, any_hit=True, tile=tile, slab=8,
                         compact=True, bmax=1024, rowmax=1 << 21,
                         return_overflow=True, return_demand=True)
dmv = jax.device_get(dm)
dd, rr = int(dmv[0]), int(dmv[1])
bmax = max(1024, -(-int(dd * 1.25) // 1024) * 1024)
rowmax = max(8192, int(rr * 1.25))
log(f"[ao-compact] run tile={tile} bmax={bmax} rowmax={rowmax}")


def run():
    h, ovf = trace_sweep(grid, srt, any_hit=True, tile=tile, slab=8,
                         compact=True, bmax=bmax, rowmax=rowmax,
                         return_overflow=True)
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
log(f"[ao-compact] {np.median(ts) * 1e3:.1f} ms/wave "
    f"overflow={bool(jax.device_get(ovf))} occ={occ.mean():.4f} "
    f"ref={occ_ref.mean():.4f} agree={np.mean(occ == occ_ref):.4f}")

# ---- 3. primaries via compact -----------------------------------------
h_c, ovf, dm = trace_sweep(grid, rays, coherent=True, compact=True,
                           return_overflow=True, return_demand=True)
h_d = trace_sweep(grid, rays, coherent=True)
agree = np.mean(np.asarray(h_c.tri_id) == np.asarray(h_d.tri_id))
dmv = jax.device_get(dm)
log(f"[primary-compact] demand={int(dmv[0])} rows={int(dmv[1])} "
    f"agree_vs_dense={agree:.6f}")
