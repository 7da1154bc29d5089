"""RenderSession demand-calibrated block budgets: the second frame of a
wave shape runs at ~demand * margin and must agree with the first."""

import numpy as np

from hagrid_tpu import scenes
from hagrid_tpu.core.camera import primary_rays
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.render.session import RenderSession


def test_calibrated_budget_matches_first_frame():
    v, f = scenes.cornell_box()
    tris = Triangles.from_mesh(v, f)
    s = RenderSession.create(tris, structure="packet", verts=v)
    rays = primary_rays(scenes.cornell_camera(), 64, 64, order="block")

    h1 = s.trace(rays, coherent=True)       # calibrating frame
    key = (False, True, rays.count, None)
    assert key in s._bmax_cal
    bmax, rowmax = s._bmax_cal[key]
    assert bmax % 128 == 0 and bmax >= 256

    h2 = s.trace(rays, coherent=True)       # calibrated frame
    assert (np.asarray(h1.tri_id) == np.asarray(h2.tri_id)).all()
    t1, t2 = np.asarray(h1.t), np.asarray(h2.t)
    finite = np.isfinite(t1)
    assert np.allclose(t1[finite], t2[finite])
    assert not bool(np.asarray(s.trace_overflow))
