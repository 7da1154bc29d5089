#!/usr/bin/env python
"""Round-5 adaptivity measurement: per-row refined columns vs uniform.

For sponza_like (331k tris) and san_miguel_like (1M tris), measures the
sweep planner's PEAK BLOCK DEMAND (gathered refs = blocks * 768) and
whole-frame time for:
  - 1M primaries (coherent dense planner), refine off vs on
  - 1M-ray AO wave (origin-sorted, compact planner), refine off vs on
plus build time and fine-ref inflation. Done-bar (VERDICT r4 #2):
gathered-refs cut >= 1.4x on Sponza primaries, SM:Sponza ratio <= 2x.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hagrid_tpu import scenes
from hagrid_tpu.core.camera import primary_rays
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.ops import sweep_trace as st
from hagrid_tpu.ops import sortrays
from hagrid_tpu.render import integrators
from hagrid_tpu.render.sampling import cosine_hemisphere, \
    hit_points_normals
from hagrid_tpu.utils import cache

cache.enable()


def log(*a):
    print(*a, flush=True)


def timed(fn, warmup=1, iters=3, k=2):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(k)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / k)
    return float(np.median(ts))


for scene_name in ("sponza", "san_miguel"):
    v, f, cam = scenes.load_scene(scene_name)
    tris = Triangles.from_mesh(v, f)
    W = H = 1024
    rays = primary_rays(cam, W, H, order="block")
    rows = {}
    for refine in (False, True):
        from hagrid_tpu.grid import packet
        t0 = time.perf_counter()
        grid = packet.build_packet(tris, refine=refine)
        jax.block_until_ready(grid.cols)
        t_build = time.perf_counter() - t0
        refs = int(jax.device_get(grid.total_refs))
        ri = np.asarray(jax.device_get(grid.rowinfo))
        hist = np.bincount(ri >> 28, minlength=3)
        log(f"[{scene_name} refine={refine}] build {t_build*1e3:.0f} ms "
            f"refs={refs} cap={grid.ref_capacity} m-hist={hist.tolist()}")

        # Primary demand + frame time.
        _, ovf, dm = st.trace_sweep(grid, rays, coherent=True,
                                    return_overflow=True,
                                    return_demand=True)
        d = int(jax.device_get(dm)[0])
        bmax = max(1024, -(-int(d * 1.3) // 1024) * 1024)
        hits, ovf2 = st.trace_sweep(grid, rays, coherent=True,
                                    bmax=bmax, return_overflow=True)
        hf = float(np.isfinite(np.asarray(hits.t)).mean())
        t_prim = timed(lambda: st.trace_sweep(grid, rays, coherent=True,
                                              bmax=bmax))
        log(f"  primary: demand {d} blocks ({d*768/1e6:.1f}M ref-slots) "
            f"ovf={int(jax.device_get(ovf2))} hit={hf:.3f} "
            f"{t_prim*1e3:.1f} ms = {rays.count/t_prim/1e6:.1f} Mrays/s")

        # AO wave (1 sample), origin-sorted, compact planner.
        key = jax.random.PRNGKey(0)
        p, n, found = hit_points_normals(rays, hits, grid.tris.n)
        max_dist = float(jnp.max(grid.bbox_hi - grid.bbox_lo)) * 0.1
        d3 = cosine_hemisphere(key, n)
        tmax = jnp.where(found, max_dist, 0.0)
        sec = integrators._spawn(p, n, d3, 0.0, tmax)
        sec_s, _ = sortrays.sort_rays(sec, grid.bbox_lo, grid.bbox_hi,
                                      bits=10, origin_major=True)
        sec_s = jax.block_until_ready(jax.device_put(sec_s))
        _, ovfA, dmA = st.trace_sweep(grid, sec_s, any_hit=True,
                                      return_overflow=True,
                                      return_demand=True)
        dA, rA = (int(x) for x in jax.device_get(dmA))
        bmaxA = max(1024, -(-int(dA * 1.3) // 1024) * 1024)
        rmaxA = max(8192, -(-int(rA * 1.3) // 8192) * 8192)
        _, ovfA2, dmA2 = st.trace_sweep(
            grid, sec_s, any_hit=True, bmax=bmaxA, rowmax=rmaxA,
            return_overflow=True, return_demand=True)
        dA2, rA2 = (int(x) for x in jax.device_get(dmA2))
        if int(jax.device_get(ovfA2)):
            # first probe truncated rows: grow once
            dA, rA = dA2, rA2
            bmaxA = max(1024, -(-int(dA * 1.3) // 1024) * 1024)
            rmaxA = max(8192, -(-int(rA * 1.3) // 8192) * 8192)
        t_ao = timed(lambda: st.trace_sweep(grid, sec_s, any_hit=True,
                                            bmax=bmaxA, rowmax=rmaxA))
        log(f"  AO wave: demand {dA2} blocks rows {rA2} "
            f"{t_ao*1e3:.1f} ms = {sec_s.count/t_ao/1e6:.2f} Mrays/s")
        rows[refine] = (d, dA2, refs)
    if False in rows and True in rows:
        d0, a0, r0 = rows[False]
        d1, a1, r1 = rows[True]
        log(f"[{scene_name}] primary demand cut {d0/max(d1,1):.2f}x, "
            f"AO demand cut {a0/max(a1,1):.2f}x, "
            f"ref inflation {r1/max(r0,1):.2f}x")
