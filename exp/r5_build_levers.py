#!/usr/bin/env python
"""Rebuild levers, measured: (a) one 3-wide row scatter vs three 1-wide
scatters at run starts; (b) transpose + batched cumsum cost; (c) the
true pre-SAT pair total vs the 2x-tris capacity (every cap-length pass
scales with cap); (d) small-table plane gathers vs arithmetic."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from hagrid_tpu import scenes  # noqa: E402
from hagrid_tpu.core.types import Triangles  # noqa: E402
from hagrid_tpu.grid.packet import build_packet  # noqa: E402
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
offs = jnp.sort(jax.random.randint(key, (N1,), 0, CAP, dtype=jnp.int32))
d1 = jax.random.randint(key, (N1,), -1000, 1000, dtype=jnp.int32)
d2 = jax.random.randint(jax.random.PRNGKey(1), (N1,), -9, 9,
                        dtype=jnp.int32)


def chain(fn, n=K):
    @jax.jit
    def run(x):
        acc = x
        for _ in range(n):
            acc = fn(acc) ^ (acc & 7)
        return acc.sum()
    return run


def three_scatters(v):
    a = jnp.cumsum(jnp.zeros((CAP,), jnp.int32).at[offs].add(
        jnp.ones((N1,), jnp.int32), mode="drop"))
    b = jnp.cumsum(jnp.zeros((CAP,), jnp.int32).at[offs].add(
        v, mode="drop"))
    c = jnp.cumsum(jnp.zeros((CAP,), jnp.int32).at[offs].add(
        d2 + v % 2, mode="drop"))
    return (a + b + c)[offs % CAP][:N1]


def one_scatter3(v):
    upd = jnp.stack([jnp.ones((N1,), jnp.int32), v, d2 + v % 2], axis=1)
    acc = jnp.zeros((CAP, 3), jnp.int32).at[offs].add(upd, mode="drop")
    s = jnp.cumsum(acc.T, axis=1)
    return (s[0] + s[1] + s[2])[offs % CAP][:N1]


def one_scatter4(v):
    upd = jnp.stack([jnp.ones((N1,), jnp.int32), v, d2 + v % 2,
                     v - d2], axis=1)
    acc = jnp.zeros((CAP, 4), jnp.int32).at[offs].add(upd, mode="drop")
    s = jnp.cumsum(acc.T, axis=1)
    return (s[0] + s[1] + s[2] + s[3])[offs % CAP][:N1]


P = jnp.linspace(0.0, 30.0, 33)
vv = jax.random.randint(key, (CAP,), 0, 32, dtype=jnp.int32)


def plane_gather(v):
    idx = jnp.clip(vv + v[:CAP] % 2, 0, 32)
    return (P[idx] + P[jnp.minimum(idx + 1, 32)]).astype(jnp.int32)[:N1]


def plane_arith(v):
    idx = jnp.clip(vv + v[:CAP] % 2, 0, 32).astype(jnp.float32)
    return (0.0 + idx * (30.0 / 32) * 2 + (30.0 / 32)).astype(
        jnp.int32)[:N1]


for name, fn in [("3x 1-wide scatter+cumsum", three_scatters),
                 ("1x 3-wide scatter+cumsumT", one_scatter3),
                 ("1x 4-wide scatter+cumsumT", one_scatter4),
                 ("plane small-table gather x2", plane_gather),
                 ("plane arithmetic", plane_arith)]:
    t = timed(chain(fn), d1)
    print(f"{name:28s}: {t:8.2f} / {K} = {t / K:6.2f} ms", flush=True)

# (c) true pair totals at bench dims.
v, f, cam = scenes.load_scene("sponza")
tris = Triangles.from_mesh(v, f)
g = build_packet(tris)
print(f"total_pairs={int(jax.device_get(g.total_pairs))} "
      f"total_refs={int(jax.device_get(g.total_refs))} "
      f"ref_capacity={g.ref_capacity}", flush=True)
