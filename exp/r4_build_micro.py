#!/usr/bin/env python
"""Microbench the packet-build primitives: (N,3) row layout vs (3,N)
transposed, and the (cap,6) forward-fill vs bit-packed (cap,) form."""

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
v0 = jnp.asarray(rng.uniform(0, 30, (N, 3)), jnp.float32)
e1 = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
e2 = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
v0T, e1T, e2T = v0.T, e1.T, e2.T
blo = jnp.zeros(3) - 1.0
bhi = jnp.zeros(3) + 31.0
dims = jnp.array([32, 43, 34], jnp.int32)


def timed(fn, *a, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@jax.jit
def ranges_rows(v0, e1, e2):
    v1 = v0 + e1
    v2 = v0 + e2
    tlo = jnp.minimum(jnp.minimum(v0, v1), v2)
    thi = jnp.maximum(jnp.maximum(v0, v1), v2)
    inv = dims.astype(jnp.float32) / (bhi - blo)
    lo = jnp.clip(jnp.floor((tlo - blo) * inv).astype(jnp.int32), 0,
                  dims - 1)
    hi = jnp.clip(jnp.floor((thi - blo) * inv).astype(jnp.int32), 0,
                  dims - 1)
    return lo.sum() + hi.sum()


@jax.jit
def ranges_T(v0T, e1T, e2T):
    v1 = v0T + e1T
    v2 = v0T + e2T
    tlo = jnp.minimum(jnp.minimum(v0T, v1), v2)
    thi = jnp.maximum(jnp.maximum(v0T, v1), v2)
    inv = (dims.astype(jnp.float32) / (bhi - blo))[:, None]
    lo = jnp.clip(jnp.floor((tlo - blo[:, None]) * inv).astype(jnp.int32),
                  0, dims[:, None] - 1)
    hi = jnp.clip(jnp.floor((thi - blo[:, None]) * inv).astype(jnp.int32),
                  0, dims[:, None] - 1)
    return lo.sum() + hi.sum()


print("ranges rows (N,3):", timed(ranges_rows, v0, e1, e2) * 1e3, "ms")
print("ranges T (3,N):   ", timed(ranges_T, v0T, e1T, e2T) * 1e3, "ms")

# forward fill: (cap, 6) vs bit-packed 2x (cap,)
ls = jnp.asarray(rng.integers(0, 100, (N, 6)), jnp.int32)
starts = jnp.asarray(np.sort(rng.choice(CAP, N, replace=False)), jnp.int32)


@jax.jit
def ff_rows(ls, starts):
    d = jnp.diff(ls, axis=0, prepend=jnp.zeros((1, 6), ls.dtype))
    out = jnp.cumsum(
        jnp.zeros((CAP, 6), jnp.int32).at[starts].add(d, mode="drop"),
        axis=0)
    return out.sum()


@jax.jit
def ff_packed(ls, starts):
    p1 = ls[:, 0] + (ls[:, 1] << 10) + (ls[:, 2] << 20)
    p2 = ls[:, 3] + (ls[:, 4] << 10) + (ls[:, 5] << 20)
    o = []
    for p in (p1, p2):
        d = jnp.diff(p, prepend=jnp.zeros((1,), p.dtype))
        ff = jnp.cumsum(
            jnp.zeros((CAP,), jnp.int32).at[starts].add(d, mode="drop"))
        o.append(((ff & 1023).sum() + ((ff >> 10) & 1023).sum()
                  + ((ff >> 20) & 1023).sum()))
    return o[0] + o[1]


print("ff rows (cap,6): ", timed(ff_rows, ls, starts) * 1e3, "ms")
print("ff packed 2x1d:  ", timed(ff_packed, ls, starts) * 1e3, "ms")

# row gather of tri_t (N, 16) at cap indices  vs  transposed math cost
tri_t = jnp.asarray(rng.uniform(size=(N, 16)), jnp.float32)
idx = jnp.asarray(rng.integers(0, N, CAP), jnp.int32)


@jax.jit
def rowgather(tri_t, idx):
    return tri_t[idx].sum()


print("row gather (cap x 16):", timed(rowgather, tri_t, idx) * 1e3, "ms")

# SAT cost shape: ~50 elementwise ops on (cap,) columns vs (cap,3) rows
a3 = jnp.asarray(rng.uniform(size=(CAP, 3)), jnp.float32)


@jax.jit
def ops_rows(a3):
    x = a3
    for _ in range(16):
        x = jnp.abs(x) * 1.01 + 0.1
    return x.sum()


aT = a3.T


@jax.jit
def ops_T(aT):
    x = aT
    for _ in range(16):
        x = jnp.abs(x) * 1.01 + 0.1
    return x.sum()


print("16 ops (cap,3):", timed(ops_rows, a3) * 1e3, "ms")
print("16 ops (3,cap):", timed(ops_T, aT) * 1e3, "ms")


# fused (4,N) column scatter + axis-1 cumsum vs 4 separate 1-D passes
offs = jnp.asarray(np.sort(rng.choice(CAP, N, replace=False)), jnp.int32)
d4 = jnp.asarray(rng.integers(-100, 100, (4, N)), jnp.int32)


@jax.jit
def scatter4_1d(offs, d4):
    tot = 0
    for i in range(4):
        acc = jnp.zeros((CAP,), jnp.int32).at[offs].add(d4[i], mode="drop")
        tot += jnp.cumsum(acc).sum()
    return tot


@jax.jit
def scatter4_fused(offs, d4):
    acc = jnp.zeros((4, CAP), jnp.int32).at[:, offs].add(d4, mode="drop")
    return jnp.cumsum(acc, axis=1).sum()


@jax.jit
def scatter4_rows(offs, d4):
    acc = jnp.zeros((CAP, 4), jnp.int32).at[offs].add(d4.T, mode="drop")
    return jnp.cumsum(acc, axis=0).sum()


print("4x 1-D scatter+cumsum:", timed(scatter4_1d, offs, d4) * 1e3, "ms")
print("fused (4,N) col scat: ", timed(scatter4_fused, offs, d4) * 1e3, "ms")
print("fused (N,4) row scat: ", timed(scatter4_rows, offs, d4) * 1e3, "ms")
