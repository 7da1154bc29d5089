#!/usr/bin/env python
"""Scatter/gather cost vs the indices_are_sorted / unique_indices hints
and vs i64 packing, at the rebuild's working size. The build's scatter
targets (expansion run starts) and its pre-sort gather indices
(tri_idx) are ascending, so if XLA's sorted path vectorizes we can
reclaim most of the rebuild's scatter wall."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from hagrid_tpu.utils import cache  # noqa: E402

cache.enable()

CAP = 663552
N1 = 331732
K = 8


def timed(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


key = jax.random.PRNGKey(0)
# Sorted scatter targets, like expansion run starts (N1 starts in CAP).
offs = jnp.sort(jax.random.randint(key, (N1,), 0, CAP, dtype=jnp.int32))
vals = jax.random.randint(key, (N1,), -1000, 1000, dtype=jnp.int32)
# Sorted gather indices, like tri_idx (CAP indices into N1 rows).
gsorted = jnp.sort(jax.random.randint(key, (CAP,), 0, N1,
                                      dtype=jnp.int32))
tri_t = jax.random.normal(key, (N1, 16), jnp.float32)


def chain(fn, n=K):
    @jax.jit
    def run(x):
        acc = x
        for _ in range(n):
            acc = fn(acc) ^ (acc & 7) if acc.dtype == jnp.int32 \
                else fn(acc) + (acc % 7)
        return acc.sum()
    return run


def sc_plain(v):
    return jnp.cumsum(jnp.zeros((CAP,), jnp.int32).at[offs].add(
        v, mode="drop"))[offs % CAP][:N1]


def sc_sorted(v):
    return jnp.cumsum(jnp.zeros((CAP,), jnp.int32).at[offs].add(
        v, mode="drop", indices_are_sorted=True))[offs % CAP][:N1]


def sc_sorted64(v):
    z = jnp.zeros((CAP,), jnp.int64).at[offs].add(
        v.astype(jnp.int64) << 30, mode="drop",
        indices_are_sorted=True)
    return (jnp.cumsum(z) >> 30).astype(jnp.int32)[offs % CAP][:N1]


def g_plain(v):
    idx = (gsorted + v[0] % 3)[:CAP]
    return tri_t[idx].sum(1).astype(jnp.int32)[:N1]


def g_sorted(v):
    idx = (gsorted + v[0] % 3)[:CAP]
    return tri_t.at[idx].get(mode="clip", indices_are_sorted=True).sum(
        1).astype(jnp.int32)[:N1]


jax.config.update("jax_enable_x64", True)
for name, fn, x in [("scatter plain", sc_plain, vals),
                    ("scatter sorted", sc_sorted, vals),
                    ("scatter sorted i64", sc_sorted64, vals),
                    ("rowgather plain", g_plain, vals),
                    ("rowgather sorted", g_sorted, vals)]:
    t = timed(chain(fn), x)
    print(f"{name:18s}: {t:8.2f} ms / {K} = {t / K:6.2f} ms",
          flush=True)
