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
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--workload", default="primary",
                    choices=("primary", "ao", "path", "dynamic"),
                    help="BASELINE.json config to run")
    ap.add_argument("--structure", default="packet",
                    choices=("packet", "irregular", "uniform"),
                    help="acceleration structure / tracer path")
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

    from hagrid_tpu.utils.config import BuildParams

    if scene_name == "san_miguel" and args.structure == "irregular":
        # Foliage-heavy scene: a finer grid explodes ref counts/HBM.
        params = BuildParams(levels=2, snd_density=1.0, top_density=0.08)
    elif args.workload == "dynamic" and args.structure == "irregular":
        params = BuildParams.dynamic()  # rebuild-dominated workload
    else:
        params = BuildParams()
    tris = Triangles.from_mesh(v, f)
    session = RenderSession.create(tris, params,
                                   structure=args.structure, verts=v)

    # --- build benchmark -------------------------------------------------
    build_s = timed(session.rebuild, tris, warmup=1, iters=max(2, iters))
    log(f"grid rebuild: {build_s * 1e3:.2f} ms "
        f"({session.describe()})")

    extra = {
        "rebuild_ms": round(build_s * 1e3, 2),
        "tris": int(len(f)),
        "device": str(dev),
        "structure": args.structure,
        "grid": session.describe(),
    }

    if args.workload == "primary":
        rays = primary_rays(cam, w, h, order="block")
        rays = jax.block_until_ready(jax.device_put(rays))
        trace_s = timed(session.trace, rays, warmup=2, iters=iters)
        mrays = (w * h) / trace_s / 1e6
        log(f"primary rays {w}x{h}: {trace_s * 1e3:.2f} ms "
            f"= {mrays:.1f} Mrays/s")
        hits = session.trace(rays)
        frac = float(np.mean(np.asarray(hits.tri_id) >= 0))
        log(f"hit fraction: {frac:.3f}")
        extra.update(rays=w * h, hit_fraction=round(frac, 4))
        metric, value = f"primary_mrays_{scene_name}", mrays

    elif args.workload == "ao":
        from hagrid_tpu.render import integrators

        n_samples = 4
        rays = primary_rays(cam, w, h, order="block")
        hits = session.trace(rays)
        key = jax.random.PRNGKey(0)

        def run():
            return integrators.ambient_occlusion(
                session, rays, hits, key, n_samples=n_samples)

        ao_s = timed(run, warmup=1, iters=iters)
        sec = w * h * n_samples
        mrays = sec / ao_s / 1e6
        log(f"AO ({n_samples} spp) {w}x{h}: {ao_s * 1e3:.1f} ms "
            f"= {mrays:.1f} M secondary rays/s")
        extra.update(secondary_rays=sec)
        metric, value = f"ao_mrays_{scene_name}", mrays

    elif args.workload == "path":
        from hagrid_tpu.render import integrators

        bounces = 4

        def run():
            return integrators.path_trace(session, cam, w, h, spp=1,
                                          max_bounces=bounces)

        pt_s = timed(run, warmup=1, iters=max(2, iters // 2))
        total = w * h * (bounces + 1)  # upper bound; waves shrink
        mrays = total / pt_s / 1e6
        log(f"path {w}x{h} {bounces} bounces: {pt_s * 1e3:.1f} ms "
            f"<= {mrays:.1f} Mrays/s")
        extra.update(bounces=bounces)
        metric, value = f"path_mrays_{scene_name}", mrays

    else:  # dynamic
        from hagrid_tpu.render.dynamic import AnimatedScene

        scene_anim = AnimatedScene(v, f)
        rays = primary_rays(cam, w, h, order="block")

        def frame(t):
            session.rebuild(scene_anim.frame(t))
            return session.trace(rays).t

        jax.block_until_ready(frame(0.0))  # compile
        t0 = time.perf_counter()
        n_frames = max(3, iters)
        for i in range(n_frames):
            jax.block_until_ready(frame(0.1 * (i + 1)))
        fps = n_frames / (time.perf_counter() - t0)
        log(f"dynamic {w}x{h}: {fps:.2f} fps (rebuild+trace per frame)")
        metric, value = f"dynamic_fps_{scene_name}", fps

    if args.structure == "packet":
        # Deferred validity checks (the hot path never reads back).
        assert not bool(jax.device_get(session.grid.overflowed)), \
            "packet grid ref capacity overflowed; raise ref_capacity"
        if session.trace_overflow is not None:
            ovf = bool(jax.device_get(session.trace_overflow))
            extra["trace_overflow"] = ovf
            if ovf:
                # Fully incoherent waves can exceed any fixed block
                # budget; surplus blocks are dropped (some occluders may
                # be missed). Reported, not hidden.
                log("WARNING: sweep block budget overflowed during "
                    "tracing; some far panels were dropped")

    print(json.dumps({
        "metric": metric,
        "value": round(value, 3),
        "unit": "fps" if args.workload == "dynamic" else "Mrays/s",
        "vs_baseline": round(value / 200.0, 5),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
