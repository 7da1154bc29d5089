"""Pallas dense intersector vs the oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from hagrid_tpu import oracle, scenes
from hagrid_tpu.core.types import Rays, Triangles
from hagrid_tpu.ops.pallas_intersect import (REF_BLOCK, RAY_TILE,
                                             intersect_binned, pack_rays)


def test_dense_intersector_matches_oracle():
    # One tile of rays, all assigned the full (padded) triangle range —
    # brute force through the kernel must match the brute-force oracle.
    v, f = scenes.random_soup(40, seed=7)
    tris = Triangles.from_mesh(v, f)
    rng = np.random.default_rng(3)
    n = RAY_TILE
    org = rng.uniform(-0.2, 1.2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays.make(org, d)

    t = tris.count
    n_blocks = -(-t // REF_BLOCK)
    r_pad = n_blocks * REF_BLOCK
    idb = jnp.arange(t, dtype=jnp.int32).view(jnp.float32) \
        if hasattr(jnp.arange(t), "view") else None
    import jax
    idb = jax.lax.bitcast_convert_type(
        jnp.arange(r_pad, dtype=jnp.int32), jnp.float32)
    pad = r_pad - t
    ref_tris = jnp.concatenate([
        jnp.pad(tris.v0, ((0, pad), (0, 0))),
        jnp.pad(tris.e1, ((0, pad), (0, 0))),
        jnp.pad(tris.e2, ((0, pad), (0, 0))),
        idb[:, None],
        jnp.zeros((r_pad, 2), jnp.float32)], axis=1)

    rays8 = pack_rays(rays)
    ranges = jnp.tile(jnp.asarray([[0, t]], jnp.int32), (n, 1))
    # Items: same ray tile against every ref block.
    ray_off = jnp.zeros((n_blocks,), jnp.int32)
    ref_off = jnp.arange(n_blocks, dtype=jnp.int32) * REF_BLOCK

    best_t, best_id = intersect_binned(ray_off, ref_off, rays8, ranges,
                                       ref_tris, interpret=True)
    want = oracle.closest_hit(rays, tris)
    want_t = np.asarray(want.t)
    got_t = np.asarray(best_t)
    m = np.asarray(want.tri_id) >= 0
    # The kernel keeps first-best on ties within a block sweep; compare by
    # t (ids can differ only on exact-tie hits, absent in random soup).
    np.testing.assert_allclose(got_t[m], want_t[m], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.isfinite(got_t), m)
    np.testing.assert_array_equal(np.asarray(best_id)[m],
                                  np.asarray(want.tri_id)[m])
