#!/usr/bin/env python
"""Generate the scaled golden hashes (VERDICT r4 #7 / SURVEY §4.4).

Renders sponza_like + san_miguel_like at 128^2 (eyelight; sponza also
AO) through the flagship RenderSession and prints the dhash of each
image plus wall times. Run on CPU to pin the hashes, then on TPU
(HAGRID_TEST_PLATFORM unset) to verify cross-backend hamming <= 3.
"""

import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

if "--tpu" not in sys.argv:
    # The session's axon plugin overrides JAX_PLATFORMS (see
    # tests/conftest.py); config.update wins.
    jax.config.update("jax_platforms", "cpu")

from hagrid_tpu import oracle, scenes  # noqa: E402
from hagrid_tpu.core.camera import primary_rays  # noqa: E402
from hagrid_tpu.core.types import Triangles  # noqa: E402
from hagrid_tpu.io.image import dhash, shade_eyelight  # noqa: E402
from hagrid_tpu.render.integrators import render_ao  # noqa: E402
from hagrid_tpu.render.session import RenderSession  # noqa: E402
from hagrid_tpu.utils import cache  # noqa: E402

cache.enable()
W = H = 128


def log(*a):
    print(*a, flush=True)


def eyelight(name, n_tris, cam, check_oracle=False):
    t0 = time.perf_counter()
    v, f = getattr(scenes, name)(n_tris)
    tris = Triangles.from_mesh(v, f)
    s = RenderSession.create(tris, verts=v)
    rays = primary_rays(cam, W, H)
    hits = jax.block_until_ready(s.trace(rays))
    img = shade_eyelight(np.asarray(hits.tri_id), np.asarray(hits.t),
                         np.asarray(tris.n), np.asarray(rays.dir), W, H)
    log(f"[{name} {n_tris}] eyelight dhash={dhash(img)} "
        f"hit={float(np.mean(np.asarray(hits.tri_id) >= 0)):.3f} "
        f"({time.perf_counter() - t0:.1f}s)")
    if check_oracle:
        t0 = time.perf_counter()
        want = oracle.closest_hit(rays, tris)
        ok = np.array_equal(np.asarray(hits.tri_id),
                            np.asarray(want.tri_id))
        log(f"[{name} {n_tris}] oracle ids exact: {ok} "
            f"({time.perf_counter() - t0:.1f}s)")
        oimg = shade_eyelight(np.asarray(want.tri_id),
                              np.asarray(want.t), np.asarray(tris.n),
                              np.asarray(rays.dir), W, H)
        log(f"[{name} {n_tris}] oracle dhash={dhash(oimg)}")
    return s, tris, cam


def ao(name, s, cam):
    t0 = time.perf_counter()
    img, _ = render_ao(s, cam, W, H, seed=3, n_samples=4)
    img = np.asarray(jax.block_until_ready(img))
    ovf = s.poll_overflow(recalibrate=False)
    log(f"[{name}] ao dhash={dhash(img)} mean={img.mean():.4f} "
        f"overflow={ovf} ({time.perf_counter() - t0:.1f}s)")


s, tris, cam = eyelight("sponza_like", 262144, scenes.sponza_camera(),
                        check_oracle="--oracle" in sys.argv)
ao("sponza_like", s, scenes.sponza_camera())
eyelight("san_miguel_like", 1000000, scenes.san_miguel_camera())
log("done")
