#!/usr/bin/env python
"""Round-5 AO wave stage split on the compact planner path.

Measures, for ONE steady-state Sponza AO wave (1M any-hit rays,
origin-major sorted, tile=256, slab=8, calibrated budgets):
  bin | +precompute+plan_dense | +plan_items2 | +kernel(dma)
plus per-round block/row demand, to find where the 455-557 ms/wave goes
(AO honest target is >= 4 M sec-rays/s = 250 ms for 1M secondary rays).
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
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.ops import sweep_trace as st
from hagrid_tpu.render import integrators
from hagrid_tpu.render.sampling import cosine_hemisphere, \
    hit_points_normals
from hagrid_tpu.render.session import RenderSession
from hagrid_tpu.ops import sortrays
from hagrid_tpu.utils import cache

cache.enable()


def log(*a):
    print(*a, flush=True)


def timed_pipe(fn, k=4, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(k)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / k)
    return float(np.median(ts))


v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
session = RenderSession.create(tris, structure="packet", verts=v)
grid = session.grid
W = H = 1024
rays = primary_rays(cam, W, H, order="block")
hits = session.trace(rays, coherent=True)
key = jax.random.PRNGKey(0)
p, n, found = hit_points_normals(rays, hits, grid.tris.n)
max_dist = float(jnp.max(grid.bbox_hi - grid.bbox_lo)) * 0.1
d = cosine_hemisphere(jax.random.split(key, 1)[0], n)
tmax = jnp.where(found, max_dist, 0.0)
sec = integrators._spawn(p, n, d, 0.0, tmax)
sec_sorted, perm = sortrays.sort_rays(
    sec, grid.bbox_lo, grid.bbox_hi, bits=10, origin_major=True)
sec_sorted = jax.block_until_ready(jax.device_put(sec_sorted))

# Calibrate once (what RenderSession would do).
_, ovf, dm = st.trace_sweep(grid, sec_sorted, any_hit=True,
                            return_overflow=True, return_demand=True)
dmh = jax.device_get(dm)
D, ROWS = int(dmh[0]), int(dmh[1])
log(f"demand: {D} blocks, {ROWS} rows, first-probe ovf="
    f"{int(jax.device_get(ovf))}")
BMAX = max(1024, -(-int(D * 1.5) // 1024) * 1024)
ROWMAX = max(8192, -(-int(ROWS * 1.5) // 8192) * 8192)
log(f"budgets: bmax={BMAX} rowmax={ROWMAX}")

TILE = 256
SLAB = 8
da_max = max(dd[0] for dd in grid.dims3)
max_rounds = -(-da_max // SLAB)


def _cap(r):
    f = 1.0 if r == 0 else (0.75 if r == 1 else 0.5)
    return max(128, int(BMAX * f) // 128 * 128)


BCAPS = tuple(_cap(r) for r in range(max_rounds))
ROWCAPS = tuple(max(4096, (-(-ROWMAX * b // BCAPS[0]) // 8) * 8 + 8)
                for b in BCAPS)
log(f"bcaps={BCAPS} rounds={max_rounds}")

ngroups = st._NGROUPS - 1
n = sec_sorted.count
n_pad = (-(-n // TILE) + ngroups + 1) * TILE
nt = n_pad // TILE


@functools.partial(jax.jit, static_argnames=("upto",))
def stage(org, dir, tmin, tmax, upto):
    xp_ext, xt_ext, inv = st._bin_rays(org, dir, tmin, tmax, n_pad,
                                       TILE, fine=False)
    if upto == 0:
        return xp_ext.sum()
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
    ka = per_tile["k0"]
    step = per_tile["step"]
    cols_u = grid.cols.reshape(-1, st._U, st._GW)
    dead_idx = cols_u.shape[0] - 1
    acc = jnp.float32(0)
    for ri, bcap in enumerate(BCAPS):
        gidx, tile_of, tminb, n_blocks, demand, row_ovf, nrow = \
            st._plan_items2(per_ray, per_tile, cs_tab, n_tab, lo_tab,
                            grid.rs, grid.rowinfo, ka, best[0],
                            grid.dims3, SLAB,
                            True, ROWCAPS[ri], bcap, dead_idx)
        if upto == 1:
            acc += demand + nrow
            ka = ka + step * SLAB
            continue
        if upto == 2:
            acc += gidx.sum() + tminb.sum() + n_blocks
            ka = ka + step * SLAB
            continue
        seed = best[0]
        xt_round = jax.lax.dynamic_update_slice(
            xt_ext,
            jnp.concatenate([seed.reshape(1, -1),
                             jnp.full((1, TILE), -st._BIG)], axis=1),
            (14, 0))
        w = min(st._CHUNK, bcap)

        def chunk_body(state, xt_round=xt_round, gidx=gidx,
                       tile_of=tile_of, tminb=tminb, w=w):
            i, b = state
            off = i * w
            t_c = jax.lax.dynamic_slice_in_dim(tile_of, off, w)
            tb_c = jax.lax.dynamic_slice_in_dim(tminb, off, w)
            gi_c = jax.lax.dynamic_slice_in_dim(
                gidx, off * st._UPB, w * st._UPB)
            out_ext = st._sweep_dma(xt_round, grid.cols, gi_c, t_c,
                                    tb_c, TILE, True)
            return (i + 1, st._merge(b, out_ext, t_c))

        def chunk_cond(state, n_blocks=n_blocks, w=w, bcap=bcap):
            return state[0] * w < jnp.minimum(n_blocks, bcap)

        _, best = jax.lax.while_loop(chunk_cond, chunk_body,
                                     (jnp.int32(0), best))
        ka = ka + step * SLAB
    if upto >= 3:
        return best[0].sum() + best[1].sum()
    return acc


args = (sec_sorted.org, sec_sorted.dir, sec_sorted.tmin, sec_sorted.tmax)
snames = ["bin", "+plan_dense(in items2)", "+plan_items2", "+kernel"]
prev = 0.0
for upto in range(4):
    t = timed_pipe(functools.partial(stage, *args, upto=upto))
    log(f"[stage] {snames[upto]:24s}: {t * 1e3:7.2f} ms "
        f"(+{1e3 * (t - prev):6.2f})")
    prev = t

# Per-round demand (one probe).
_, _, dmr = st.trace_sweep(grid, sec_sorted, any_hit=True, bmax=BMAX,
                           rowmax=ROWMAX, return_overflow=True,
                           return_demand=True)
log(f"calibrated run peak demand: {np.asarray(jax.device_get(dmr))}")

# Whole-wave reference number via the session path.
def wave():
    return st.trace_sweep(grid, sec_sorted, any_hit=True, bmax=BMAX,
                          rowmax=ROWMAX)


t = timed_pipe(wave)
log(f"[whole wave] {t * 1e3:.2f} ms = {n / t / 1e6:.2f} M rays/s")
