"""Benchmark-as-test (SURVEY.md §4.5): fails when the flagship path
regresses >25% below the last recorded round's numbers — on ALL FOUR
BASELINE workloads (primary, AO, path, dynamic) plus the rebuild.

AO/path thresholds are only honest when the run drops no occluder work,
so the test additionally asserts the session's overflow flag is CLEAR
for them: an "improvement" that comes from silently dropping blocks
fails instead of ratcheting (VERDICT r4 #5; thresholds recorded from
overflow-free runs only).

Only meaningful on real TPU hardware; under the CPU conftest default it
skips (CI validates correctness, bench.py + this test validate speed).
Run with HAGRID_TEST_PLATFORM=axon (or tpu) on a TPU host.
"""

import json
import os
import time

import jax
import pytest

THRESHOLDS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_thresholds.json")

needs_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="perf regression check needs TPU")


@pytest.fixture(scope="module")
def sponza_session():
    from hagrid_tpu import scenes
    from hagrid_tpu.core.types import Triangles
    from hagrid_tpu.render.session import RenderSession
    from hagrid_tpu.utils import cache

    cache.enable()
    v, f = scenes.sponza_like(262144)
    tris = Triangles.from_mesh(v, f)
    session = RenderSession.create(tris, structure="packet", verts=v)
    return session, tris, v, f


@pytest.fixture(scope="module")
def thresholds():
    with open(THRESHOLDS) as fh:
        return json.load(fh)


def _best_of(fn, iters=3):
    jax.block_until_ready(fn())   # compile / calibrate
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


@needs_tpu
def test_primary_and_rebuild_do_not_regress(sponza_session, thresholds):
    from hagrid_tpu import scenes
    from hagrid_tpu.core.camera import primary_rays

    session, tris, _, _ = sponza_session
    th = thresholds
    rays = primary_rays(scenes.sponza_camera(), 1024, 1024)

    best = _best_of(lambda: session.trace(rays).t)
    mrays = rays.count / best / 1e6
    assert mrays >= 0.75 * th["primary_mrays_sponza"], \
        f"primary {mrays:.2f} Mrays/s < 75% of {th['primary_mrays_sponza']}"

    best = _best_of(lambda: session.rebuild(tris))
    rebuild_ms = best * 1e3
    assert rebuild_ms <= 1.25 * th["rebuild_ms_sponza"], \
        f"rebuild {rebuild_ms:.1f} ms > 125% of {th['rebuild_ms_sponza']}"


@needs_tpu
def test_ao_does_not_regress_and_is_complete(sponza_session, thresholds):
    from hagrid_tpu import scenes
    from hagrid_tpu.core.camera import primary_rays
    from hagrid_tpu.render import integrators

    session, _, _, _ = sponza_session
    th = thresholds
    w = h = 1024
    n_samples = 4
    rays = primary_rays(scenes.sponza_camera(), w, h, order="block")
    hits = session.trace(rays, coherent=True)
    key = jax.random.PRNGKey(0)

    best = _best_of(lambda: integrators.ambient_occlusion(
        session, rays, hits, key, n_samples=n_samples), iters=2)
    # The threshold only binds for COMPLETE frames (no dropped blocks).
    assert not session.poll_overflow(recalibrate=False), \
        "AO wave overflowed its calibrated budget: number is tainted"
    mrays = w * h * n_samples / best / 1e6
    assert mrays >= 0.75 * th["ao_mrays_sponza"], \
        f"AO {mrays:.2f} M sec-rays/s < 75% of {th['ao_mrays_sponza']}"


@needs_tpu
def test_path_does_not_regress_and_is_complete(sponza_session,
                                               thresholds):
    from hagrid_tpu import scenes
    from hagrid_tpu.render import integrators

    session, _, _, _ = sponza_session
    th = thresholds
    w = h = 1024
    bounces = 4
    cam = scenes.sponza_camera()

    best = _best_of(lambda: integrators.path_trace(
        session, cam, w, h, spp=1, max_bounces=bounces), iters=2)
    assert not session.poll_overflow(recalibrate=False), \
        "path wave overflowed its calibrated budget: number is tainted"
    mrays = w * h * (bounces + 1) / best / 1e6
    assert mrays >= 0.75 * th["path_mrays_upper_sponza"], \
        f"path {mrays:.2f} Mrays/s < 75% of {th['path_mrays_upper_sponza']}"


@needs_tpu
def test_dynamic_does_not_regress(sponza_session, thresholds):
    import numpy as np

    from hagrid_tpu import scenes
    from hagrid_tpu.core.camera import primary_rays
    from hagrid_tpu.core.types import Triangles
    from hagrid_tpu.render.dynamic import AnimatedScene
    from hagrid_tpu.render.session import RenderSession

    _, _, v, f = sponza_session
    th = thresholds
    rays = primary_rays(scenes.sponza_camera(), 1024, 1024,
                        order="block")
    ext = np.asarray(v, np.float32).max(0) - np.asarray(
        v, np.float32).min(0)
    session = RenderSession.create(
        Triangles.from_mesh(v, f), None, structure="packet", verts=v,
        bbox_margin=float(0.26 / max(ext.min(), 1e-6)))
    scene_anim = AnimatedScene(v, f)

    def frame(t):
        session.rebuild(scene_anim.frame(t))
        return session.trace(rays, coherent=True).t

    jax.block_until_ready(frame(0.0))   # compile + calibrate
    n_frames = 3
    t0 = time.perf_counter()
    outs = [frame(0.1 * (i + 1)) for i in range(n_frames)]
    jax.block_until_ready(outs)
    fps = n_frames / (time.perf_counter() - t0)
    assert fps >= 0.75 * th["dynamic_fps_sponza"], \
        f"dynamic {fps:.2f} fps < 75% of {th['dynamic_fps_sponza']}"
