#!/usr/bin/env python
"""One-process TPU measurement batch for the unit-gather round.

1. Sponza primaries: frame time, demand, hit fraction (unit gather).
2. AO wave: Morton-binned incoherent any-hit, demand + time.
3. Rebuild: packet build stage profile (cumulative).
4. San Miguel scale: packet primaries + rebuild at defaults.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hagrid_tpu import scenes
from hagrid_tpu.core.camera import primary_rays
from hagrid_tpu.core.types import Rays, Triangles
from hagrid_tpu.grid.packet import build_packet, _build
from hagrid_tpu.ops import sweep_trace as st
from hagrid_tpu.render.sampling import cosine_hemisphere, \
    hit_points_normals
from hagrid_tpu.utils import cache

cache.enable()


def log(*a):
    print(*a, flush=True)


def timed(fn, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


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


# ---- 1. Sponza primaries ------------------------------------------------
v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
grid = build_packet(tris)
rays = primary_rays(cam, 1024, 1024, order="block")
rays = jax.block_until_ready(jax.device_put(rays))
n = rays.count

h, ovf, demand = st.trace_sweep(grid, rays, coherent=True,
                                return_overflow=True, return_demand=True)
d = int(jax.device_get(demand))
hitf = float(np.mean(np.asarray(jax.device_get(h.tri_id)) >= 0))
log(f"[primary] demand={d} blocks (~{d * 512} refs) "
    f"ovf={bool(jax.device_get(ovf))} hit={hitf:.4f}")

t = timed_pipe(lambda: st.trace_sweep(grid, rays, coherent=True))
log(f"[primary] default bmax: {t * 1e3:7.2f} ms = {n / t / 1e6:6.1f} Mrays/s")
cal = max(128, -(-int(d * 13) // 1280) * 128)
t = timed_pipe(lambda: st.trace_sweep(grid, rays, coherent=True, bmax=cal))
log(f"[primary] bmax={cal}: {t * 1e3:7.2f} ms = {n / t / 1e6:6.1f} Mrays/s")

# ---- 2. AO wave (Morton-binned incoherent any-hit) ----------------------
p, nrm, found = hit_points_normals(rays, h, tris.n)
dvec = cosine_hemisphere(jax.random.PRNGKey(3), nrm)
ext = float(np.max(np.asarray(jax.device_get(grid.bbox_hi - grid.bbox_lo))))
org = p + nrm * 1e-3 * ext
tmax = jnp.where(found, ext * 0.1, 0.0)
sec = Rays(org=org, dir=dvec, tmin=jnp.zeros(n), tmax=tmax)
sec = jax.block_until_ready(jax.device_put(sec))

ha, ovfa, da_ = st.trace_sweep(grid, sec, any_hit=True,
                               return_overflow=True, return_demand=True)
da_ = int(jax.device_get(da_))
log(f"[ao] demand={da_} blocks ovf={bool(jax.device_get(ovfa))}")
t = timed_pipe(lambda: st.trace_sweep(grid, sec, any_hit=True))
log(f"[ao] default bmax: {t * 1e3:7.2f} ms = {n / t / 1e6:6.1f} Mrays/s")
cala = max(128, -(-int(da_ * 15) // 1280) * 128)
t = timed_pipe(lambda: st.trace_sweep(grid, sec, any_hit=True, bmax=cala))
log(f"[ao] bmax={cala}: {t * 1e3:7.2f} ms = {n / t / 1e6:6.1f} Mrays/s")

# ---- 3. Rebuild profile --------------------------------------------------
cap = grid.ref_capacity
t = timed(lambda: _build(tris, grid.bbox_lo, grid.bbox_hi, grid.dims3,
                         cap), warmup=2, iters=5)
log(f"[rebuild] full _build: {t * 1e3:7.2f} ms (cap {cap})")

# ---- 4. San Miguel scale -------------------------------------------------
v2, f2, cam2 = scenes.load_scene("san_miguel")
tris2 = Triangles.from_mesh(v2, f2)
t0 = time.perf_counter()
grid2 = build_packet(tris2)
log(f"[sanmiguel] first build {time.perf_counter() - t0:.2f}s "
    f"dims3={grid2.dims3} cap={grid2.ref_capacity}")
rays2 = primary_rays(cam2, 1024, 1024, order="block")
rays2 = jax.block_until_ready(jax.device_put(rays2))
h2, ovf2, d2 = st.trace_sweep(grid2, rays2, coherent=True,
                              return_overflow=True, return_demand=True)
d2 = int(jax.device_get(d2))
hit2 = float(np.mean(np.asarray(jax.device_get(h2.tri_id)) >= 0))
log(f"[sanmiguel] demand={d2} ovf={bool(jax.device_get(ovf2))} "
    f"hit={hit2:.4f}")
t = timed_pipe(lambda: st.trace_sweep(grid2, rays2, coherent=True))
log(f"[sanmiguel] default: {t * 1e3:7.2f} ms = "
    f"{rays2.count / t / 1e6:6.1f} Mrays/s")
cal2 = max(128, -(-int(d2 * 13) // 1280) * 128)
t = timed_pipe(lambda: st.trace_sweep(grid2, rays2, coherent=True,
                                      bmax=cal2))
log(f"[sanmiguel] bmax={cal2}: {t * 1e3:7.2f} ms = "
    f"{rays2.count / t / 1e6:6.1f} Mrays/s")
cap2 = grid2.ref_capacity
t = timed(lambda: _build(tris2, grid2.bbox_lo, grid2.bbox_hi,
                         grid2.dims3, cap2), warmup=1, iters=3)
log(f"[sanmiguel] rebuild: {t * 1e3:7.2f} ms")

# ---- 5. Frame stage split (cumulative, pipelined) -------------------------
import functools

TILE = 512
n_pad = -(-n // TILE) * TILE
xp_ext, xt_ext = st._pad_coherent(rays.org, rays.dir, rays.tmin,
                                  rays.tmax, n_pad, TILE)
xp_ext = jax.block_until_ready(xp_ext)
slab = max(dd[0] for dd in grid.dims3)
BCAP = max(128, -(-int(d * 13) // 1280) * 128)


@functools.partial(jax.jit, static_argnames=("upto",))
def stage(xp_ext, xt_ext, upto):
    nt = xp_ext.shape[0] // TILE - 1
    cs_tab, n_tab, lo_tab = st._tile_tabs(grid.bbox_lo, grid.bbox_hi,
                                          grid.dims3)
    per_ray, per_tile = st._precompute(
        xp_ext[:nt * TILE], cs_tab, n_tab, lo_tab, grid.bbox_lo,
        grid.bbox_hi, TILE, grid.planes)
    traceable = xp_ext[:nt * TILE, 13].reshape(nt, TILE) > 0
    best = (jnp.where(traceable, st._BIG, -st._BIG),
            jnp.full((nt, TILE), -1, jnp.int32),
            jnp.zeros((nt, TILE), jnp.float32),
            jnp.zeros((nt, TILE), jnp.float32))
    if upto == 0:
        return per_ray["enter"].sum() + per_tile["k0"].sum()
    starts, counts, thr = st._plan(
        per_ray, per_tile, cs_tab, n_tab, lo_tab, grid.rs,
        per_tile["k0"], best[0], grid.dims3, slab, False)
    if upto == 1:
        return starts.sum() + counts.sum()
    cols_u = grid.cols.reshape(-1, st._U, 20 * st._G)
    dead_idx = cols_u.shape[0] - 1
    gidx, tile_of, tminb, n_blocks, demand = st._items(
        starts, counts, thr, nt, slab, BCAP, dead_idx)
    if upto == 2:
        return gidx.sum() + tminb.sum() + n_blocks
    pieces = []
    for goff in range(0, BCAP, st._GCHUNK):
        gw = min(st._GCHUNK, BCAP - goff)

        def do_gather(gi, gw=gw):
            return cols_u[gi].reshape(gw * 128, 20 * st._G)

        def skip(gi, gw=gw):
            return jnp.zeros((gw * 128, 20 * st._G), jnp.float32)

        pieces.append(jax.lax.cond(
            n_blocks > goff, do_gather, skip,
            gidx[goff * st._UPB:(goff + gw) * st._UPB]))
    g_round = pieces[0] if len(pieces) == 1 else jnp.concatenate(
        pieces, axis=0)
    if upto == 3:
        return g_round.sum()
    seed = jnp.minimum(best[0], xp_ext[:nt * TILE, 13].reshape(nt, TILE))
    xt_round = jax.lax.dynamic_update_slice(
        xt_ext,
        jnp.concatenate([seed.reshape(1, -1),
                         jnp.full((1, TILE), -st._BIG)], axis=1),
        (14, 0))
    for off in range(0, BCAP, st._CHUNK):
        w = min(st._CHUNK, BCAP - off)
        t_c = tile_of[off:off + w]
        tb_c = tminb[off:off + w]
        g_c = jax.lax.slice_in_dim(g_round, off * 128, (off + w) * 128)

        def do_chunk(best, t_c=t_c, tb_c=tb_c, g_c=g_c):
            out_ext = st._sweep(xt_round, g_c, t_c, tb_c, 0, TILE,
                                False, False)
            return st._merge(best, out_ext, t_c)

        best = jax.lax.cond(n_blocks > off, do_chunk, lambda b: b, best)
    return best[0].sum() + best[1].sum()


snames = ["precompute", "+plan", "+items", "+gather", "+sweep"]
prev = 0.0
for upto in range(5):
    t = timed_pipe(functools.partial(stage, upto=upto), )
    log(f"[stage] {snames[upto]:12s}: {t * 1e3:7.2f} ms "
        f"(+{1e3 * (t - prev):6.2f})")
    prev = t
