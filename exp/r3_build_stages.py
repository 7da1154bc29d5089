#!/usr/bin/env python
"""Profile the packet build: cumulative stage timing (time stages 1..k,
differences = per-stage cost), single layout x3 assumed symmetric."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hagrid_tpu import scenes
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.grid.packet import (_axis_order, build_packet,
                                    tri_box_overlap)
from hagrid_tpu.grid.uniform import tri_voxel_ranges
from hagrid_tpu.ops.segment import (expand_by_counts, segment_starts,
                                    sort_pairs)
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
grid = build_packet(tris)  # poisons/honestifies + gives dims/capacity
dims3 = grid.dims3
cap = grid.ref_capacity
log(f"dims3={dims3} cap={cap}")

bbox_lo, bbox_hi = grid.bbox_lo, grid.bbox_hi

tri_t = jnp.concatenate(
    [tris.v0, tris.e1, tris.e2,
     jax.lax.bitcast_convert_type(
         jnp.arange(tris.count, dtype=jnp.int32), jnp.float32)[:, None],
     jnp.zeros((tris.count, 6), jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnames=("axis", "upto"))
def stage(tris, tri_t, bbox_lo, bbox_hi, axis, upto):
    a, b, c = _axis_order(axis)
    da, db, dc = dims3[axis]
    dims_xyz = [0, 0, 0]
    dims_xyz[a], dims_xyz[b], dims_xyz[c] = da, db, dc
    lo, hi = tri_voxel_ranges(tris, bbox_lo, bbox_hi, tuple(dims_xyz))
    span = hi - lo + 1
    counts = span[:, 0] * span[:, 1] * span[:, 2]
    if upto == 1:
        return counts.sum()
    tri_idx, rank, valid, total = expand_by_counts(counts, cap)
    if upto == 2:
        return tri_idx.sum() + rank.sum() + total
    # Production form (gather-free): int forward-fill of (lo, span).
    lospan_t = jnp.concatenate([lo, span], axis=1)
    d_ls = jnp.diff(lospan_t, axis=0, prepend=jnp.zeros(
        (1, 6), lospan_t.dtype))
    run_starts = jnp.cumsum(counts) - counts
    ls_ff = jnp.cumsum(
        jnp.zeros((cap, 6), jnp.int32).at[run_starts].add(
            d_ls, mode="drop"), axis=0)
    s = ls_ff[:, 3:6]
    l = ls_ff[:, 0:3]
    dx = rank % s[:, 0]
    rem = rank // s[:, 0]
    dy = rem % s[:, 1]
    dz = rem // s[:, 1]
    vv = jnp.stack([l[:, 0] + dx, l[:, 1] + dy, l[:, 2] + dz], axis=1)
    if upto == 3:
        return vv.sum()
    num_cells = da * db * dc
    csx = jnp.stack([(bbox_hi[0] - bbox_lo[0]) / dims_xyz[0],
                     (bbox_hi[1] - bbox_lo[1]) / dims_xyz[1],
                     (bbox_hi[2] - bbox_lo[2]) / dims_xyz[2]])
    cell_lo = bbox_lo[None, :] + vv.astype(jnp.float32) * csx[None, :]
    tvk = tri_t[tri_idx]
    if upto == 4:
        return tvk.sum() + cell_lo.sum()
    tv0 = tvk[:, 0:3]
    sat = tri_box_overlap(tv0, tv0 + tvk[:, 3:6], tv0 + tvk[:, 6:9],
                          cell_lo, cell_lo + csx[None, :])
    if upto == 5:
        return sat.sum()
    keep = valid & sat
    key = (vv[:, a] * db + vv[:, b]) * dc + vv[:, c]
    key = jnp.where(keep, key, num_cells)
    skeys, srefs = sort_pairs(key, jnp.where(keep, tri_idx, 0))
    if upto == 6:
        return skeys.sum() + srefs.sum()
    starts = segment_starts(skeys, num_cells)
    if upto == 7:
        return starts.sum()
    live = jnp.arange(cap) < starts[num_cells]
    colsT = jnp.where(live[:, None], tri_t[srefs], 0.0)
    if upto == 8:
        return colsT.sum()
    return None


names = ["voxel_ranges", "expand", "lospan_ff+coords",
         "tri_t_gather", "SAT", "sort", "segment_starts",
         "colsT_gather"]
prev = 0.0
for upto in range(1, 9):
    t = timed(stage, tris, tri_t, bbox_lo, bbox_hi, 0, upto)
    log(f"axis0 upto {upto} ({names[upto-1]:22s}): {t*1e3:8.2f} ms "
        f"(delta {1e3*(t-prev):+7.2f})")
    prev = t

# full current build for comparison
def full():
    return build_packet(tris, dims3=dims3, ref_capacity=cap,
                        bbox=(np.asarray(bbox_lo), np.asarray(bbox_hi)),
                        check=False).total_refs
t = timed(full)
log(f"full build_packet (3 layouts, check=False): {t*1e3:.2f} ms")
