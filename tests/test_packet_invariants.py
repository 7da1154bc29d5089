"""Packet-grid invariants at scale (vectorized checker; VERDICT r1 item 6:
the per-voxel python-loop checkers cannot run on >100k-tri scenes)."""

import numpy as np
import pytest

from hagrid_tpu import scenes
from hagrid_tpu.core.types import Triangles
from hagrid_tpu.grid.invariants import check_packet
from hagrid_tpu.grid.packet import build_packet


def test_packet_invariants_cornell():
    v, f = scenes.cornell_box()
    g = build_packet(Triangles.from_mesh(v, f), dims=(6, 5, 4))
    check_packet(g, sample_tris=None)


def test_packet_invariants_sponza_scale():
    v, f = scenes.sponza_like(100000)
    assert len(f) >= 100000
    g = build_packet(Triangles.from_mesh(v, f))
    check_packet(g, sample_tris=1024)


def test_packet_overflow_flag():
    v, f = scenes.cornell_box()
    tris = Triangles.from_mesh(v, f)
    g = build_packet(tris, ref_capacity=256, check=False, dims=(6, 6, 6))
    assert bool(np.asarray(g.overflowed))
    g2 = build_packet(tris, dims=(6, 6, 6))
    assert not bool(np.asarray(g2.overflowed))
