#!/usr/bin/env python
"""Round-4 build profiler matching the PRODUCTION _build exactly:
cumulative upto-k stages of grid/packet._build's per-layout pipeline
(packed-i32 forward fill, cummax rank, SAT, sort, segment starts,
cols emission), one layout, plus the full 3-layout build.

Every stage sums a small output -> each timing includes the ~24 ms
tunnel sync; read the DELTAS."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hagrid_tpu import scenes
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.grid.packet import (_axis_order, _slice_planes,
                                    build_packet, DEAD_ROWS, GROUP_LANES,
                                    MT_COLS, REF_GROUP)
from hagrid_tpu.grid.uniform import tri_box_overlap, tri_voxel_ranges
from hagrid_tpu.ops.segment import segment_starts, sort_pairs
from hagrid_tpu.utils import cache

cache.enable()


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
grid = build_packet(tris)
dims3 = grid.dims3
cap = grid.ref_capacity
bbox_lo, bbox_hi = grid.bbox_lo, grid.bbox_hi
log(f"dims3={dims3} cap={cap}")

AXIS = 0
n1 = tris.count


@functools.partial(jax.jit, static_argnames=("upto",))
def stage(tris, bbox_lo, bbox_hi, upto):
    tlo3, thi3 = tris.bounds()
    planes = _slice_planes(tlo3, thi3, bbox_lo, bbox_hi, dims3, False)
    axis = AXIS
    a, b, c = _axis_order(axis)
    da, db, dc = dims3[axis]
    dims_xyz = [0, 0, 0]
    dims_xyz[a], dims_xyz[b], dims_xyz[c] = da, db, dc
    lo, hi = tri_voxel_ranges(tris, bbox_lo, bbox_hi, tuple(dims_xyz))
    span = hi - lo + 1
    counts = span[:, 0] * span[:, 1] * span[:, 2]
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    p_lo = lo[:, 0] + (lo[:, 1] << 10) + (lo[:, 2] << 20)
    p_sp = span[:, 0] + (span[:, 1] << 10) + (span[:, 2] << 20)
    if upto == 1:  # pass 1: per-tri voxel math
        return p_lo.sum() + p_sp.sum() + total
    tri_t = jnp.concatenate(
        [tris.v0, tris.e1, tris.e2,
         jnp.arange(n1, dtype=jnp.int32).astype(jnp.float32)[:, None],
         jnp.zeros((n1, 6), jnp.float32)], axis=1)
    markers = jnp.zeros((cap,), jnp.int32).at[offsets].add(
        1, mode="drop")
    tri_idx = jnp.clip(jnp.cumsum(markers) - 1, 0, n1 - 1)
    j = jnp.arange(cap, dtype=jnp.int32)
    valid = j < total
    if upto == 2:  # markers scatter + cumsum
        return tri_idx.sum()

    def ff1(p):
        d = jnp.diff(p, prepend=jnp.zeros((1,), p.dtype))
        return jnp.cumsum(jnp.zeros(
            (cap,), jnp.int32).at[offsets].add(d, mode="drop"))

    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(markers > 0, j, 0))
    rank = j - run_start
    if upto == 3:  # cummax rank
        return rank.sum()
    lo_ff = ff1(p_lo)
    sp_ff = ff1(p_sp)
    s0 = sp_ff & 1023
    s1 = (sp_ff >> 10) & 1023
    dx = rank % s0
    rem = rank // s0
    dy = rem % s1
    dz = rem // s1
    vv = jnp.stack([(lo_ff & 1023) + dx,
                    ((lo_ff >> 10) & 1023) + dy,
                    (lo_ff >> 20) + dz], axis=1)
    if upto == 4:  # two packed ffs + voxel decode
        return vv.sum()
    tvk = tri_t[tri_idx]
    if upto == 5:  # SAT vert row gather
        return tvk.sum()
    num_cells = da * db * dc
    csx = jnp.stack([(bbox_hi[0] - bbox_lo[0]) / dims_xyz[0],
                     (bbox_hi[1] - bbox_lo[1]) / dims_xyz[1],
                     (bbox_hi[2] - bbox_lo[2]) / dims_xyz[2]])
    cell_lo = bbox_lo[None, :] + vv.astype(jnp.float32) * csx[None, :]
    cell_hi = cell_lo + csx[None, :]
    tv0 = tvk[:, 0:3]
    sat = tri_box_overlap(tv0, tv0 + tvk[:, 3:6], tv0 + tvk[:, 6:9],
                          cell_lo, cell_hi)
    keep = valid & sat
    if upto == 6:  # SAT math
        return keep.sum()
    key = (vv[:, a] * db + vv[:, b]) * dc + vv[:, c]
    key = jnp.where(keep, key, num_cells)
    skeys, srefs = sort_pairs(key, jnp.where(keep, tri_idx, 0))
    if upto == 7:  # sort
        return skeys[::997].sum() + srefs[::997].sum()
    starts = segment_starts(skeys, num_cells)
    if upto == 8:  # segment starts
        return starts.sum()
    live = jnp.arange(cap) < starts[num_cells]
    tk = tri_t[srefs]
    if upto == 9:  # cols row gather
        return tk.sum()
    v0 = tk[:, 0:3]
    e1 = tk[:, 3:6]
    e2 = tk[:, 6:9]
    nrm = jnp.cross(e1, e2)
    row20 = jnp.concatenate(
        [nrm, -e2, -jnp.cross(v0, e2), e1, jnp.cross(v0, e1),
         jnp.sum(v0 * nrm, axis=1, keepdims=True), tk[:, 9:10],
         jnp.zeros((cap, 3), jnp.float32)], axis=1)
    grp = jnp.where(live[:, None], row20, 0.0).reshape(
        cap // REF_GROUP, MT_COLS * REF_GROUP)
    cols_part = jnp.pad(
        grp, ((0, 0), (0, GROUP_LANES - MT_COLS * REF_GROUP)))
    return cols_part[::97, ::31].sum()


names = ["pass1 voxel math", "markers+cumsum", "cummax rank",
         "packed ff x2 + decode", "SAT vert gather", "SAT math",
         "sort", "segment_starts", "cols row gather", "cols emit"]
prev = 0.0
for upto in range(1, 11):
    t = timed(stage, tris, bbox_lo, bbox_hi, upto)
    log(f"[build] upto {upto:2d} {names[upto - 1]:22s}: {t * 1e3:7.2f} ms"
        f" (delta {1e3 * (t - prev):+7.2f})")
    prev = t


def full():
    return build_packet(tris, dims3=dims3, ref_capacity=cap,
                        bbox=(np.asarray(bbox_lo), np.asarray(bbox_hi)),
                        check=False).total_refs


t = timed(full)
log(f"full build_packet (3 layouts, check=False): {t * 1e3:.2f} ms")
