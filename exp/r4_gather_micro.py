#!/usr/bin/env python
"""Settle gather costs: 1-D i32 gather, row gathers at widths 16/32,
and scatter+cumsum pair — all at Sponza build sizes. Chained 8x per
sync so the ~24ms RTT amortizes."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from hagrid_tpu.utils import cache

cache.enable()

N = 331732
CAP = 663552
rng = np.random.default_rng(0)
tab1 = jnp.asarray(rng.integers(0, 1 << 29, N), jnp.int32)
tab16 = jnp.asarray(rng.uniform(size=(N, 16)), jnp.float32)
tab32 = jnp.asarray(rng.uniform(size=(N, 32)), jnp.float32)
# Build-like indices: sorted with runs (tri_idx is non-decreasing).
idx = jnp.asarray(np.sort(rng.integers(0, N, CAP)), jnp.int32)
idx_rand = jnp.asarray(rng.integers(0, N, CAP), jnp.int32)
offs = jnp.asarray(np.sort(rng.choice(CAP, N, replace=False)), jnp.int32)
d1 = jnp.asarray(rng.integers(-100, 100, N), jnp.int32)


def timed8(fn, *a, warmup=1, iters=3):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(8)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / 8)
    return float(np.median(ts))


@jax.jit
def g1(idx):
    return tab1[idx].sum()


@jax.jit
def g16(idx):
    return tab16[idx].sum()


@jax.jit
def g32(idx):
    return tab32[idx].sum()


@jax.jit
def sc(offs, d1):
    return jnp.cumsum(jnp.zeros((CAP,), jnp.int32).at[offs].add(
        d1, mode="drop")).sum()


print("1-D i32 gather sorted:", timed8(g1, idx) * 1e3, "ms")
print("1-D i32 gather random:", timed8(g1, idx_rand) * 1e3, "ms")
print("row16 gather sorted:  ", timed8(g16, idx) * 1e3, "ms")
print("row16 gather random:  ", timed8(g16, idx_rand) * 1e3, "ms")
print("row32 gather sorted:  ", timed8(g32, idx) * 1e3, "ms")
print("scatter+cumsum pair:  ", timed8(sc, offs, d1) * 1e3, "ms")
