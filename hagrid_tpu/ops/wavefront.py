"""Step-synchronous wavefront traversal (jnp, batched).

The reference traverses with one CUDA thread per ray chasing pointers
(src/traverse.cu); on TPU the equivalent performance shape is a *wavefront*:
all rays advance in lockstep through a ``while_loop`` whose body is pure
batched vector math plus batched gathers — no per-ray control flow. Each
iteration every live ray either tests a fixed-size chunk of its current
cell's refs (masked Moller-Trumbore over lanes) or steps past the whole
cell (the irregular-grid "skip by cell bbox, not voxel" rule, which is what
makes expanded cells pay off: reference src/traverse.cu computes exit t
from the CELL's int bbox).

The grid is abstracted behind two callables so the same machine drives the
uniform and the two-level irregular grid:
  lookup(voxel i32[N,3]) -> (cell i32[N], cmin i32[N,3], cmax i32[N,3])
  — cmin/cmax are the cell's inclusive int bbox in fine-voxel coords.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.intersect import moller_trumbore, safe_inv_dir, slab_test
from ..core.types import Hits, Rays, Triangles


def _load_cell(lookup, starts, voxel, in_bounds):
    """Masked cell fetch: out-of-bounds rays get an empty range."""
    safe_vox = jnp.maximum(voxel, 0)
    cell, cmin, cmax = lookup(safe_vox)
    s0 = starts[cell]
    s1 = starts[cell + 1]
    s0 = jnp.where(in_bounds, s0, 0)
    s1 = jnp.where(in_bounds, s1, 0)
    return cell, cmin, cmax, s0, s1


def trace_wavefront(rays: Rays, tris: Triangles, lookup, starts, ref_ids,
                    bbox_lo, bbox_hi, fine_dims, refs_per_iter: int = 8,
                    any_hit: bool = False, max_iters: int = 1 << 20) -> Hits:
    """March all rays through the grid in lockstep.

    Not jitted itself (``lookup`` is a closure over grid arrays); callers
    wrap it in their own jit (see grid/uniform.py, grid/irregular.py).

    fine_dims: static (3,) ints — dims of the *fine* voxel lattice that
    cmin/cmax and `voxel` are expressed in (== dims for the uniform grid,
    top_dims << levels for the irregular grid). max_iters is a safety cap
    against degenerate float edge cases causing a non-advancing ray.
    """
    n = rays.count
    dims = jnp.asarray(fine_dims, jnp.int32)
    cs = (bbox_hi - bbox_lo) / jnp.asarray(fine_dims, jnp.float32)
    inv_cs = 1.0 / cs

    org = rays.org
    dirs = rays.dir
    inv_dir = safe_inv_dir(dirs)
    pos_dir = dirs >= 0

    enter, _, ok = slab_test(org, inv_dir, bbox_lo, bbox_hi,
                             rays.tmin, rays.tmax)
    p_in = org + enter[:, None] * dirs
    vox0 = jnp.clip(jnp.floor((p_in - bbox_lo) * inv_cs).astype(jnp.int32),
                    0, dims - 1)

    cell0, cmin0, cmax0, s00, s10 = _load_cell(lookup, starts, vox0, ok)

    state = dict(
        it=jnp.int32(0),
        alive=ok,
        cursor=s00,
        end=s10,
        cmin=cmin0,
        cmax=cmax0,
        best_t=jnp.full((n,), jnp.inf, jnp.float32),
        best_id=jnp.full((n,), -1, jnp.int32),
        best_u=jnp.zeros((n,), jnp.float32),
        best_v=jnp.zeros((n,), jnp.float32),
    )

    def cond(st):
        return jnp.any(st["alive"]) & (st["it"] < max_iters)

    def body(st):
        alive = st["alive"]
        cursor = st["cursor"]
        end = st["end"]

        # --- Phase 1: masked chunk of Moller-Trumbore tests. ------------
        best_t = st["best_t"]
        best_id = st["best_id"]
        best_u = st["best_u"]
        best_v = st["best_v"]
        for k in range(refs_per_iter):
            r = cursor + k
            m = alive & (r < end)
            tid = ref_ids[jnp.where(m, r, 0)]
            tid = jnp.where(m, tid, 0)
            h, t, u, v = moller_trumbore(
                org, dirs, tris.v0[tid], tris.e1[tid], tris.e2[tid],
                rays.tmin, rays.tmax)
            better = m & h & ((t < best_t) | ((t == best_t) & (tid < best_id)))
            best_t = jnp.where(better, t, best_t)
            best_id = jnp.where(better, tid, best_id)
            best_u = jnp.where(better, u, best_u)
            best_v = jnp.where(better, v, best_v)
        cursor = jnp.minimum(cursor + refs_per_iter, end)

        # --- Phase 2: rays whose cell is exhausted step past the cell. --
        finished_cell = alive & (cursor >= end)
        # Exit t per axis from the cell's int bbox (NOT the voxel) — the
        # cell-skipping rule that exploits merged/expanded cells.
        hi_plane = bbox_lo + (st["cmax"] + 1).astype(jnp.float32) * cs
        lo_plane = bbox_lo + st["cmin"].astype(jnp.float32) * cs
        t_axes = jnp.where(pos_dir, (hi_plane - org) * inv_dir,
                           (lo_plane - org) * inv_dir)
        t_axes = jnp.where(dirs != 0.0, t_axes, jnp.inf)
        t_exit = jnp.min(t_axes, axis=-1)
        axis = jnp.argmin(t_axes, axis=-1)

        if any_hit:
            terminated = best_id >= 0
        else:
            terminated = best_t <= t_exit
        terminated = terminated | (t_exit >= rays.tmax)

        # Next voxel: jump on the exit axis to just past the cell bbox;
        # recompute the other axes from the ray point at t_exit (robust —
        # no accumulation of incremental DDA error across skips).
        p_exit = org + t_exit[:, None] * dirs
        vox = jnp.clip(jnp.floor((p_exit - bbox_lo) * inv_cs)
                       .astype(jnp.int32), 0, dims - 1)
        jump = jnp.where(pos_dir, st["cmax"] + 1, st["cmin"] - 1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.bool_)
        vox = jnp.where(onehot, jump, vox)
        in_bounds = jnp.all((vox >= 0) & (vox < dims), axis=-1)

        advance = finished_cell & ~terminated & in_bounds
        cell, cmin, cmax, s0, s1 = _load_cell(lookup, starts, vox, advance)

        new_alive = alive & jnp.where(finished_cell, advance, True)
        return dict(
            it=st["it"] + 1,
            alive=new_alive,
            cursor=jnp.where(advance, s0, cursor),
            end=jnp.where(advance, s1, end),
            cmin=jnp.where(advance[:, None], cmin, st["cmin"]),
            cmax=jnp.where(advance[:, None], cmax, st["cmax"]),
            best_t=best_t, best_id=best_id, best_u=best_u, best_v=best_v,
        )

    out = jax.lax.while_loop(cond, body, state)
    found = out["best_id"] >= 0
    return Hits(tri_id=out["best_id"],
                t=jnp.where(found, out["best_t"], jnp.inf),
                u=out["best_u"], v=out["best_v"])
