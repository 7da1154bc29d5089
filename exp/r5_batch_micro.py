#!/usr/bin/env python
"""Does batching 3 layout streams into (3, cap) amortize scan/scatter
cost? Times 3x separate vs 1x batched cumsum / scatter-add / sort /
row-gather at the rebuild's working size (cap=663552). Chained through
a data dependency + D2H sync (docs/ARCHITECTURE.md timing note)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from hagrid_tpu.utils import cache  # noqa: E402

cache.enable()

CAP = 663552
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
x = jax.random.randint(key, (3, CAP), 0, 1 << 20, dtype=jnp.int32)
idx = jax.random.randint(key, (3, CAP), 0, CAP, dtype=jnp.int32)
li = jnp.arange(3, dtype=jnp.int32)[:, None]
tri_t = jax.random.normal(key, (331732, 16), jnp.float32)
tidx = jax.random.randint(key, (3, CAP), 0, 331732, dtype=jnp.int32)


def chain(fn, n=K):
    @jax.jit
    def run(x):
        acc = x
        for _ in range(n):
            acc = fn(acc) + acc % 7
        return acc.sum()
    return run


def sep_cumsum(x):
    return jnp.stack([jnp.cumsum(x[i]) for i in range(3)])


def bat_cumsum(x):
    return jnp.cumsum(x, axis=1)


def sep_scatter(x):
    return jnp.stack([
        jnp.zeros((CAP,), jnp.int32).at[idx[i]].add(x[i], mode="drop")
        for i in range(3)])


def bat_scatter(x):
    return jnp.zeros((3, CAP), jnp.int32).at[li, idx].add(x, mode="drop")


def sep_sort(x):
    outs = [jax.lax.sort((x[i], x[(i + 1) % 3]), num_keys=1,
                         is_stable=True) for i in range(3)]
    return jnp.stack([o[0] + o[1] for o in outs])


def bat_sort(x):
    k, v = jax.lax.sort((x, jnp.roll(x, 1, 0)), dimension=1, num_keys=1,
                        is_stable=True)
    return k + v


def sep_rowgather(x):
    return jnp.stack([
        (tri_t[tidx[i] % ((x[i, 0] % 3) + 331730)]).sum(1) for i in
        range(3)]).astype(jnp.int32)


def bat_rowgather(x):
    return tri_t[tidx % ((x[:, :1] % 3) + 331730)].sum(2).astype(
        jnp.int32)


for name, fn in [("cumsum sep", sep_cumsum), ("cumsum bat", bat_cumsum),
                 ("scatter sep", sep_scatter),
                 ("scatter bat", bat_scatter),
                 ("sort sep", sep_sort), ("sort bat", bat_sort),
                 ("rowgather sep", sep_rowgather),
                 ("rowgather bat", bat_rowgather)]:
    t = timed(chain(fn), x)
    print(f"{name:14s}: {t:8.2f} ms / {K} reps = {t / K:6.2f} ms each",
          flush=True)
