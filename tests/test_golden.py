"""Golden-image regression tests (SURVEY.md §4.4).

The reference validates by rendered-image comparison; here the golden is
the brute-force oracle render of the same scene — structure-independent
ground truth. We compare hit-id maps exactly and t-maps within tolerance,
and pin a coarse perceptual hash of the shaded image so shading
regressions are caught too.
"""

import hashlib

import numpy as np

from hagrid_tpu import oracle, scenes
from hagrid_tpu.core.camera import primary_rays
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.io.image import shade_eyelight, to_u8
from hagrid_tpu.render.session import RenderSession
from hagrid_tpu.utils.config import BuildParams

SMALL = BuildParams(top_density=0.3, snd_density=2.0, levels=2,
                    merge_passes=2, expansion_passes=2)
W = H = 64


def _render(session, tris, cam):
    rays = primary_rays(cam, W, H)
    hits = session.trace(rays)
    img = shade_eyelight(np.asarray(hits.tri_id), np.asarray(hits.t),
                         np.asarray(tris.n), np.asarray(rays.dir), W, H)
    return rays, hits, img


def test_cornell_golden_vs_oracle():
    v, f = scenes.cornell_box()
    tris = Triangles.from_mesh(v, f)
    s = RenderSession.create(tris, SMALL)
    rays, hits, img = _render(s, tris, scenes.cornell_camera())
    want = oracle.closest_hit(rays, tris)
    np.testing.assert_array_equal(np.asarray(hits.tri_id),
                                  np.asarray(want.tri_id))
    m = np.asarray(want.tri_id) >= 0
    np.testing.assert_allclose(np.asarray(hits.t)[m],
                               np.asarray(want.t)[m], rtol=1e-4, atol=1e-4)


def test_cornell_image_hash_stable():
    """Coarse (quantized) image hash: catches shading/camera regressions
    while tolerating float jitter. Update the hash only for intentional
    changes to camera/shading/geometry."""
    v, f = scenes.cornell_box()
    tris = Triangles.from_mesh(v, f)
    s = RenderSession.create(tris, SMALL)
    _, _, img = _render(s, tris, scenes.cornell_camera())
    q = (to_u8(img) >> 4).astype(np.uint8)  # 16 levels: float-jitter-proof
    h = hashlib.sha256(q.tobytes()).hexdigest()[:16]
    assert h == "fb83fdf3e236bd52", f"image hash changed: {h}"
