#!/usr/bin/env python
"""Probe the dynamic-workload regression: time rebuild and trace
separately per frame, and count compiles via jax log."""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from hagrid_tpu import scenes
from hagrid_tpu.core.camera import primary_rays
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.render.dynamic import AnimatedScene
from hagrid_tpu.render.session import RenderSession
from hagrid_tpu.utils import cache

cache.enable()


def log(*a):
    print(*a, flush=True)


v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
rays = primary_rays(cam, 1024, 1024, order="block")
rays = jax.block_until_ready(jax.device_put(rays))

ext = np.asarray(v, np.float32).max(0) - np.asarray(v, np.float32).min(0)
session = RenderSession.create(
    tris, None, structure="packet", verts=v,
    bbox_margin=float(0.26 / max(ext.min(), 1e-6)))
log(f"dims3={session.grid.dims3} cap={session.grid.ref_capacity}")

scene_anim = AnimatedScene(v, f)

# warm
t0 = time.perf_counter()
tris0 = scene_anim.frame(0.0)
jax.block_until_ready(tris0.v0)
log(f"frame-gen compile: {time.perf_counter() - t0:.2f}s")
t0 = time.perf_counter()
jax.block_until_ready(session.rebuild(tris0))
log(f"rebuild compile+run: {time.perf_counter() - t0:.2f}s")
t0 = time.perf_counter()
jax.block_until_ready(session.trace(rays, coherent=True).t)
log(f"trace compile+run: {time.perf_counter() - t0:.2f}s")

for i in range(4):
    t = 0.1 * (i + 1)
    t0 = time.perf_counter()
    tr = scene_anim.frame(t)
    jax.block_until_ready(tr.v0)
    t1 = time.perf_counter()
    jax.block_until_ready(session.rebuild(tr))
    t2 = time.perf_counter()
    jax.block_until_ready(session.trace(rays, coherent=True).t)
    t3 = time.perf_counter()
    log(f"frame {t:.1f}: gen {1e3 * (t1 - t0):7.1f} ms  "
        f"rebuild {1e3 * (t2 - t1):7.1f} ms  trace {1e3 * (t3 - t2):7.1f} ms")
