#!/usr/bin/env python
"""Round-4: validate the wired-up compact path end to end.

1. Small random scene vs brute oracle (dense + compact, thr suffix-min
   in effect).
2. Sponza primary: dense timing + exactness after the thr suffix-min.
3. Sponza AO: compact demand UNSORTED vs origin-sorted at the new
   defaults (tile=256, slab=8) — is the integrator sort pulling its
   weight on the compact planner too?
4. Session-path AO end to end (integrators.ambient_occlusion through
   RenderSession calibration): trace_overflow must stay False and the
   mean AO must match the known-good dense reference level.
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
from hagrid_tpu.render.session import RenderSession
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
    ha = trace_sweep(g, rays, any_hit=True, compact=compact)
    oka = np.mean((np.asarray(ha.tri_id) >= 0)
                  == (np.asarray(ho.tri_id) >= 0))
    log(f"[small] compact={int(compact)}: closest agree={ok:.4f} "
        f"anyhit agree={oka:.4f}")

# ---- 2. Sponza primary after thr suffix-min ----------------------------
v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
grid = build_packet(tris)
rays = primary_rays(cam, 1024, 1024, order="block")


def prim():
    return trace_sweep(grid, rays, coherent=True)


h1 = jax.block_until_ready(prim())
ts = []
for _ in range(4):
    t0 = time.perf_counter()
    jax.block_until_ready(prim())
    ts.append(time.perf_counter() - t0)
lat = float(np.median(ts))
log(f"[primary] {lat * 1e3:.1f} ms single-frame "
    f"= {1024 * 1024 / lat / 1e6:.1f} Mrays/s "
    f"hitfrac={float(np.mean(np.asarray(h1.tri_id) >= 0)):.4f}")

# ---- 3. compact AO demand unsorted vs sorted ---------------------------
hits = prim()
p, nn, found = hit_points_normals(rays, hits, grid.tris.n)
max_dist = float(jnp.max(grid.bbox_hi - grid.bbox_lo)) * 0.1
k = jax.random.split(jax.random.PRNGKey(0), 2)[0]
dd_ = cosine_hemisphere(k, nn)
tmax = jnp.where(found, max_dist, 0.0)
sec = integrators._spawn(p, nn, dd_, 0.0, tmax)
srt, perm = sortrays.sort_rays(sec, grid.bbox_lo, grid.bbox_hi,
                               bits=10, origin_major=True)
for name, w in (("unsorted", sec), ("sorted", srt)):
    _, _, dm = trace_sweep(grid, w, any_hit=True, bmax=1024,
                           rowmax=1 << 21, return_overflow=True,
                           return_demand=True)
    dmv = jax.device_get(dm)
    log(f"[ao-demand] {name}: demand={int(dmv[0])} blocks "
        f"rows={int(dmv[1])} (defaults tile=256 slab=8 compact)")

# ---- 4. session-path AO end to end -------------------------------------
sess = RenderSession.create(tris, verts=v)
key = jax.random.PRNGKey(0)


def ao_run():
    return integrators.ambient_occlusion(sess, rays, hits, key,
                                         n_samples=4)


ao = jax.block_until_ready(ao_run())   # calibrating pass
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(ao_run())
    ts.append(time.perf_counter() - t0)
ao_s = float(np.median(ts))
ovf = bool(jax.device_get(sess.trace_overflow))
log(f"[session-ao] {ao_s * 1e3:.1f} ms (4 waves) = "
    f"{4 * 1024 * 1024 / ao_s / 1e6:.2f} M sec-rays/s "
    f"trace_overflow={ovf} mean_ao={float(jnp.mean(ao)):.4f}")
log(f"[session-ao] calibration: { {k_: v for k_, v in sess._bmax_cal.items()} }")
