#!/usr/bin/env python
"""Microbench the sweep kernel: per-live-block, per-dead-block, and
per-launch fixed costs, at tile 512 and 128."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hagrid_tpu.ops import sweep_trace as st
from hagrid_tpu.utils import cache

cache.enable()


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# Honestify timings (axon poison note).
_ = jax.device_get(jnp.zeros(()) + 1)

key = jax.random.PRNGKey(0)

for tile in (512, 128):
    nt = 64
    n_cols = (nt + 1) * tile
    xt_ext = jax.random.normal(key, (16, n_cols), jnp.float32)
    for chunk in (4096, 1024):
        g = jax.random.normal(key, (chunk * 128, 16 * st._G),
                              jnp.float32)

        def mk(n_live):
            # live blocks cycle tiles so flushes happen like real runs
            t_of = np.full((chunk,), nt, np.int32)
            if n_live:
                t_of[:n_live] = np.repeat(
                    np.arange(nt), -(-n_live // nt))[:n_live]
            return jnp.asarray(t_of)

        js = jax.jit(lambda tof, g, xt: st._sweep(xt, g, tof, 0, tile,
                                                  False)[0].sum())
        rows = []
        for n_live in (0, chunk // 4, chunk // 2, chunk):
            tof = mk(n_live)
            t = timed(js, tof, g, xt_ext)
            rows.append((n_live, t))
            log(f"tile={tile} chunk={chunk} live={n_live:5d}: "
                f"{t*1e3:8.3f} ms")
        # slope us/live block
        (l0, t0), (l1, t1) = rows[1], rows[-1]
        log(f"  -> per-live-block {1e6*(t1-t0)/(l1-l0):.2f} us, "
            f"launch+dead({chunk}) {rows[0][1]*1e3:.3f} ms")
