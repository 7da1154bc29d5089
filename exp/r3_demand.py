#!/usr/bin/env python
"""Plan-only demand probe (no kernel): blocks + gathered units per
scene/config. Hardware-independent; runs fine on CPU."""

import os
import sys
import time

import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hagrid_tpu import scenes
from hagrid_tpu.core.camera import primary_rays
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.grid.packet import build_packet
from hagrid_tpu.ops import sweep_trace as st
from hagrid_tpu.utils import cache

cache.enable()
TILE = 512


def demand(grid, rays):
    n_pad = -(-rays.count // TILE) * TILE
    xp_ext, _ = st._pad_coherent(rays.org, rays.dir, rays.tmin,
                                 rays.tmax, n_pad, TILE)
    slab = max(d[0] for d in grid.dims3)

    @jax.jit
    def probe(xp_ext):
        nt = xp_ext.shape[0] // TILE - 1
        cs_tab, n_tab, lo_tab = st._tile_tabs(grid.bbox_lo, grid.bbox_hi,
                                              grid.dims3)
        per_ray, per_tile = st._precompute(
            xp_ext[:nt * TILE], cs_tab, n_tab, lo_tab, grid.bbox_lo,
            grid.bbox_hi, TILE, grid.planes)
        traceable = xp_ext[:nt * TILE, 13].reshape(nt, TILE) > 0
        best0 = jnp.where(traceable, st._BIG, -st._BIG)
        starts, counts, thr = st._plan(
            per_ray, per_tile, cs_tab, n_tab, lo_tab, grid.rs,
            per_tile["k0"], best0, grid.dims3, slab, False)
        cnt2 = counts.reshape(nt, -1)
        pads = -(-cnt2.sum(1) // st._UPB) * st._UPB
        return cnt2.sum(), pads.sum() // st._UPB

    units, blocks = jax.device_get(probe(xp_ext))
    return int(units), int(blocks)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="sponza")
    ap.add_argument("--size", default="1024x1024")
    ap.add_argument("--cross", type=float, nargs="*", default=[0.4])
    ap.add_argument("--slice", type=float, dest="slice_", default=0.02)
    ap.add_argument("--uniform-planes", action="store_true")
    args = ap.parse_args()
    v, f, cam = scenes.load_scene(args.scene)
    tris = Triangles.from_mesh(v, f)
    w, h = (int(x) for x in args.size.split("x"))
    rays = primary_rays(cam, w, h, order="block")
    for cross in args.cross:
        t0 = time.time()
        grid = build_packet(tris, cross_density=cross,
                            slice_density=args.slice_,
                            adaptive=not args.uniform_planes)
        units, blocks = demand(grid, rays)
        print(f"{args.scene} {w}x{h} cross={cross} slice={args.slice_} "
              f"adaptive={not args.uniform_planes}: dims={grid.dims3[0]} "
              f"units={units} blocks={blocks} "
              f"refs_gathered={units * 32} ({time.time() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
