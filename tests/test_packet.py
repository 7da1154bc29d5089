"""Packet grid: layout invariants + MT-matmul parity with the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hagrid_tpu import scenes
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.grid import packet
from hagrid_tpu.grid.uniform import build_uniform


@pytest.fixture(scope="module")
def cornell():
    v, f = scenes.cornell_box()
    return Triangles.from_mesh(v, f)


def _cell_sets(starts3, refid, axis, dims):
    """Per-(x,y,z)-cell ref sets from one axis layout."""
    a, b, c = packet._axis_order(axis)
    s = np.asarray(starts3)
    ids = np.asarray(jax.lax.bitcast_convert_type(refid, jnp.int32))[0]
    out = {}
    for ka in range(dims[a]):
        for kb in range(dims[b]):
            for kc in range(dims[c]):
                r0, r1 = s[ka, kb, kc], s[ka, kb, kc + 1]
                xyz = [0, 0, 0]
                xyz[a], xyz[b], xyz[c] = ka, kb, kc
                out[tuple(xyz)] = frozenset(ids[r0:r1].tolist())
    return out


def test_three_layouts_agree_with_uniform(cornell):
    dims = (4, 4, 4)
    g = packet.build_packet(cornell, dims=dims, march_tables=True)
    u = build_uniform(cornell, dims=dims)
    # Uniform grid cell sets (x-fastest linearization). The packet build
    # SAT-prunes pairs the uniform AABB binning keeps, so each layout's
    # set must equal the uniform set filtered by the exact overlap test.
    from hagrid_tpu.grid.uniform import tri_box_overlap
    us = np.asarray(u.cell_starts)
    uref = np.asarray(u.ref_ids)
    v0 = np.asarray(cornell.v0)
    v1 = v0 + np.asarray(cornell.e1)
    v2 = v0 + np.asarray(cornell.e2)
    # f32 corner math, exactly like the build (float64 promotion flips
    # boundary pairs).
    blo = np.asarray(g.bbox_lo)
    cs = ((np.asarray(g.bbox_hi) - blo) / 4.0).astype(np.float32)
    expected = {}
    for z in range(4):
        for y in range(4):
            for x in range(4):
                cell = (z * 4 + y) * 4 + x
                ts = uref[us[cell]:us[cell + 1]]
                clo = blo + np.array([x, y, z], np.float32) * cs
                keep = np.asarray(tri_box_overlap(
                    v0[ts], v1[ts], v2[ts],
                    np.broadcast_to(clo, (len(ts), 3)),
                    np.broadcast_to(clo + cs, (len(ts), 3))))
                expected[(x, y, z)] = frozenset(ts[keep].tolist())
    for axis in range(3):
        starts3, _, refid = g.axis_tables(axis)
        got = _cell_sets(starts3, refid, axis, dims)
        assert got == expected, f"axis {axis} layout disagrees"


def test_starts_monotone_and_total(cornell):
    g = packet.build_packet(cornell, dims=(5, 3, 4), march_tables=True)
    dims = (5, 3, 4)
    for axis in range(3):
        a, b, c = packet._axis_order(axis)
        da, db, dc = dims[a], dims[b], dims[c]
        starts3, _, _ = g.axis_tables(axis)
        # Padded up to the tracer's window minimums.
        assert starts3.shape == (max(da, packet.PAD_A),
                                 packet.pad_b(db),
                                 packet.pad_c1(dc + 1))
        real = np.asarray(starts3)[:da, :db, :dc + 1]
        flat_rows = real.reshape(-1, dc + 1)
        # Within each row: monotone; across rows: row end == next row start.
        assert (np.diff(flat_rows, axis=1) >= 0).all()
        assert (flat_rows[1:, 0] == flat_rows[:-1, -1]).all()
        assert flat_rows[-1, -1] == int(g.total_refs)
        # Edge padding never invents refs: padded col runs are empty.
        pad = np.asarray(starts3)
        assert (np.diff(pad, axis=2)[:, :, dc:] == 0).all()


def test_mt_matmul_matches_classic(cornell):
    """X @ refq reproduces classic Moller-Trumbore t/u/v and hit set."""
    from hagrid_tpu.core.intersect import moller_trumbore

    key = jax.random.PRNGKey(1)
    n = 256
    org = jax.random.normal(key, (n, 3)) * 0.2 + jnp.asarray([0.5, 0.5, 2.0])
    dir = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    dir = dir / jnp.linalg.norm(dir, axis=1, keepdims=True)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), jnp.inf)

    x = packet.rays_to_x(org, dir, tmin, tmax)
    bq = packet.mt_matmul_columns(cornell)          # [T, 4, 12]
    b = bq.transpose(1, 2, 0)                       # [4, 12, T]
    y_t = x[:, 0:12] @ b[0]
    y_det = x[:, 0:12] @ b[1]
    y_u = x[:, 0:12] @ b[2]
    y_v = x[:, 0:12] @ b[3]
    inv = jnp.where(jnp.abs(y_det) > 1e-9, 1.0 / y_det, 0.0)
    t_m, u_m, v_m = y_t * inv, y_u * inv, y_v * inv

    h, t, u, v = moller_trumbore(
        org[:, None, :], dir[:, None, :], cornell.v0[None], cornell.e1[None],
        cornell.e2[None], tmin[:, None], tmax[:, None])
    h_m = ((jnp.abs(y_det) > 1e-9) & (u_m >= -1e-5) & (v_m >= -1e-5)
           & (u_m + v_m <= 1 + 1e-5) & (t_m > 0))
    hits = np.asarray(h)
    # Every classic hit is found with matching t/u/v (tolerance: different
    # f32 association order).
    sel = hits
    assert np.asarray(h_m)[sel].all()
    np.testing.assert_allclose(np.asarray(t_m)[sel], np.asarray(t)[sel],
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(u_m)[sel], np.asarray(u)[sel],
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v_m)[sel], np.asarray(v)[sel],
                               rtol=2e-2, atol=2e-3)
