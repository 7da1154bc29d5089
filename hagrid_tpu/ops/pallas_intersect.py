"""Experimental Pallas TPU kernel: binned dense Moller-Trumbore.

The wavefront tracer's triangle tests cost one row-gather per ref
(ops/wavefront.py); this kernel is the gather-free alternative for
ref-heavy workloads: rays sorted/binned by cell, and each grid step DMAs a
*contiguous* block of inlined triangle rows (ref_tris) plus a tile of rays
into VMEM via scalar-prefetch-driven BlockSpecs, then runs a dense
RAY_TILE x REF_BLOCK intersection on the VPU with per-ray [start,end)
masking. Zero gathers — all memory movement is block DMA.

Status: validated against the oracle (tests/test_pallas.py, interpret mode
on CPU; compiled on TPU). Not yet the default path: with the current
irregular-grid quality the mean refs/cell is small, so the march (not the
tri test) dominates; integration target is the binned-bounce pipeline in
round 2. NOTE for this toolchain: jnp.cross / (N,3) column math crashes
the Mosaic remote compiler — all vector math is componentwise on (N,)
lanes, and data is laid out in 8/16-wide rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 128   # rays per grid step
REF_BLOCK = 16   # triangle rows per grid step (dense tested against all)


def _kernel(ray_off, ref_off, first, rays_ref, rng_ref, refs_ref, out_ref):
    """One (ray tile, ref block) item.

    rays_ref: (RAY_TILE, 8) f32 [org3, dir3, tmin, tmax]
    rng_ref:  (RAY_TILE, 2) i32 [start, end) absolute ref rows
    refs_ref: (REF_BLOCK, 12) f32 ref_tris rows
    out_ref:  (RAY_TILE, 2) f32 [best_t, best_id_bits]

    Items for one ray tile must be CONSECUTIVE in the grid: the out block
    then stays resident in VMEM and accumulates the min across blocks;
    `first[i]` marks the tile's first item (initializes the block).
    """
    i = pl.program_id(0)

    @pl.when(first[i] != 0)
    def _():
        out_ref[:, 0] = jnp.full((RAY_TILE,), jnp.inf, jnp.float32)
        out_ref[:, 1] = jnp.zeros((RAY_TILE,), jnp.float32)

    ox = rays_ref[:, 0]
    oy = rays_ref[:, 1]
    oz = rays_ref[:, 2]
    dx = rays_ref[:, 3]
    dy = rays_ref[:, 4]
    dz = rays_ref[:, 5]
    tmin = rays_ref[:, 6]
    tmax = rays_ref[:, 7]
    s0 = rng_ref[:, 0]
    s1 = rng_ref[:, 1]
    base = ref_off[i]

    best_t = out_ref[:, 0]
    best_id = out_ref[:, 1]  # id bits as f32

    for k in range(REF_BLOCK):
        vx = refs_ref[k, 0]
        vy = refs_ref[k, 1]
        vz = refs_ref[k, 2]
        e1x = refs_ref[k, 3]
        e1y = refs_ref[k, 4]
        e1z = refs_ref[k, 5]
        e2x = refs_ref[k, 6]
        e2y = refs_ref[k, 7]
        e2z = refs_ref[k, 8]
        idb = refs_ref[k, 9]
        # p = d x e2 (componentwise — vector slicing crashes Mosaic here)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
        tx = ox - vx
        ty = oy - vy
        tz = oz - vz
        u = (tx * px + ty * py + tz * pz) * inv
        # q = t x e1
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        row = base + k
        ok = ((row >= s0) & (row < s1)
              & (jnp.abs(det) > 1e-9)
              & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t > tmin) & (t < tmax) & (t < best_t))
        best_t = jnp.where(ok, t, best_t)
        best_id = jnp.where(ok, idb, best_id)

    out_ref[:, 0] = best_t
    out_ref[:, 1] = best_id


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_binned(ray_off, ref_off, rays8, ranges, ref_tris,
                     interpret: bool = False):
    """Run the dense intersector over items.

    ray_off: i32[ITEMS] — row offset of each item's ray tile (multiple of
      RAY_TILE) into rays8. ref_off: i32[ITEMS] — row offset of each item's
      ref block (multiple of REF_BLOCK) into ref_tris.
    rays8: f32[n_rays, 8]; ranges: i32[n_rays, 2] absolute [start, end);
    ref_tris: f32[R, 12]. Returns (best_t f32[n_rays], best_id i32[n_rays])
    — the min over all items covering each ray (rays may appear in several
    items when their cell's refs span blocks; combine outside if so).
    """
    n_items = ray_off.shape[0]
    n_rays = rays8.shape[0]
    first = (jnp.roll(ray_off, 1) != ray_off).astype(jnp.int32)
    first = first.at[0].set(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_items,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, 8),
                         lambda i, ro, fo, fi: (ro[i] // RAY_TILE, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 2),
                         lambda i, ro, fo, fi: (ro[i] // RAY_TILE, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((REF_BLOCK, 12),
                         lambda i, ro, fo, fi: (fo[i] // REF_BLOCK, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_TILE, 2),
                               lambda i, ro, fo, fi: (ro[i] // RAY_TILE, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_rays, 2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ray_off, ref_off, first, rays8, ranges, ref_tris)
    best_t = out[:, 0]
    best_id = jax.lax.bitcast_convert_type(out[:, 1], jnp.int32)
    found = jnp.isfinite(best_t)
    return (jnp.where(found, best_t, jnp.inf),
            jnp.where(found, best_id, -1))


def pack_rays(rays):
    """Rays SoA -> (n, 8) f32 rows for the kernel."""
    return jnp.concatenate(
        [rays.org, rays.dir, rays.tmin[:, None], rays.tmax[:, None]],
        axis=1)
