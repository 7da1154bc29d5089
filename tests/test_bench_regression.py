"""Benchmark-as-test (SURVEY.md §4.5): fails when the flagship path
regresses >25% below the last recorded round's numbers.

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


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="perf regression check needs TPU")
def test_primary_and_rebuild_do_not_regress():
    from hagrid_tpu import scenes
    from hagrid_tpu.core.camera import primary_rays
    from hagrid_tpu.core.types import Triangles
    from hagrid_tpu.render.session import RenderSession

    with open(THRESHOLDS) as fh:
        th = json.load(fh)

    v, f = scenes.sponza_like(262144)
    tris = Triangles.from_mesh(v, f)
    session = RenderSession.create(tris, structure="packet", verts=v)
    rays = primary_rays(scenes.sponza_camera(), 1024, 1024)

    jax.block_until_ready(session.trace(rays).t)   # compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(session.trace(rays).t)
        best = min(best, time.perf_counter() - t0)
    mrays = rays.count / best / 1e6
    assert mrays >= 0.75 * th["primary_mrays_sponza"], \
        f"primary {mrays:.2f} Mrays/s < 75% of {th['primary_mrays_sponza']}"

    jax.block_until_ready(session.rebuild(tris))   # compile warm path
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(session.rebuild(tris))
        best = min(best, time.perf_counter() - t0)
    rebuild_ms = best * 1e3
    assert rebuild_ms <= 1.25 * th["rebuild_ms_sponza"], \
        f"rebuild {rebuild_ms:.1f} ms > 125% of {th['rebuild_ms_sponza']}"
