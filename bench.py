#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line with the headline metric.

Headline (BASELINE.md): Mrays/s primary rays on the Sponza-scale scene +
grid rebuild ms, on one TPU chip. Stage breakdown goes to stderr; stdout
gets exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 200 Mrays/s (the BASELINE.json north-star target).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import numpy as np

from hagrid_tpu.utils import cache

cache.enable()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, warmup=2, iters=5, **kw):
    """Median wall time of fn(*args) with block_until_ready."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small scene + image for a fast smoke run")
    ap.add_argument("--scene", default=None,
                    help="scene name or .obj path (default sponza-like)")
    ap.add_argument("--size", default=None, help="WxH, default 1024x1024")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from hagrid_tpu import scenes
    from hagrid_tpu.core.camera import primary_rays
    from hagrid_tpu.core.types import Triangles
    from hagrid_tpu.render.session import RenderSession

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    if args.quick:
        scene_name = args.scene or "cornell"
        size = args.size or "256x256"
        iters = 2
    else:
        scene_name = args.scene or "sponza"
        size = args.size or "1024x1024"
        iters = args.iters
    w, h = (int(x) for x in size.split("x"))

    t0 = time.perf_counter()
    v, f, cam = scenes.load_scene(scene_name)
    log(f"scene {scene_name}: {len(f)} tris "
        f"({time.perf_counter() - t0:.2f}s to generate)")

    tris = Triangles.from_mesh(v, f)
    session = RenderSession.create(tris)

    # --- build benchmark -------------------------------------------------
    build_s = timed(session.rebuild, tris, warmup=1, iters=max(2, iters))
    log(f"grid rebuild: {build_s * 1e3:.2f} ms "
        f"({session.describe()})")

    # --- primary-ray benchmark ------------------------------------------
    rays = primary_rays(cam, w, h)
    rays = jax.block_until_ready(jax.device_put(rays))
    trace_s = timed(session.trace, rays, warmup=2, iters=iters)
    mrays = (w * h) / trace_s / 1e6
    log(f"primary rays {w}x{h}: {trace_s * 1e3:.2f} ms = {mrays:.1f} Mrays/s")

    hits = session.trace(rays)
    frac = float(np.mean(np.asarray(hits.tri_id) >= 0))
    log(f"hit fraction: {frac:.3f}")

    print(json.dumps({
        "metric": f"primary_mrays_{scene_name}",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 200.0, 4),
        "extra": {
            "rebuild_ms": round(build_s * 1e3, 2),
            "tris": int(len(f)),
            "rays": w * h,
            "hit_fraction": round(frac, 4),
            "device": str(dev),
        },
    }))


if __name__ == "__main__":
    main()
