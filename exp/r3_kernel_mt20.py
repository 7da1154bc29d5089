#!/usr/bin/env python
"""Decompose the MT20 sweep kernel's per-block cost on TPU.

Variants (same shell: prefetch, first/last flush, early-out check):
  full      : production body (4 sets x 17 col reads, ~38 ops/pair)
  det_only  : 4 sets x 3 col reads, det + acc_t update only
              (isolates column-broadcast + minimal math)
  no_body   : MT body skipped entirely (tminb forces done)
All blocks live, one tile per 8 blocks (realistic flush rate).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from hagrid_tpu.ops import sweep_trace as st
from hagrid_tpu.utils import cache

cache.enable()
_ = jax.device_get(jnp.zeros(()) + 1)  # honestify timings


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


def make_det_kernel(tile, nt):
    def kernel(tile_of, tminb, xt_ref, g_ref, out_ref,
               acc_t, acc_id, acc_u, acc_v, acc_bt):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        t_cur = tile_of[i]
        first = (i == 0) | (t_cur != tile_of[jnp.maximum(i - 1, 0)])
        last = (i == n - 1) | (t_cur != tile_of[jnp.minimum(i + 1,
                                                            n - 1)])
        live = t_cur < nt

        @pl.when(first & live)
        def _():
            best = xt_ref[14:15, :]
            acc_t[:] = jnp.broadcast_to(best, (128, tile))
            acc_id[:] = jnp.full((128, tile), -1.0, jnp.float32)
            acc_u[:] = jnp.zeros((128, tile), jnp.float32)
            acc_v[:] = jnp.zeros((128, tile), jnp.float32)
            acc_bt[0:1, :] = best

        bt_bits = jax.lax.bitcast_convert_type(acc_bt[0:1, :], jnp.int32)
        done = jnp.all(bt_bits <= tminb[i])

        @pl.when(live & ~done)
        def _():
            dx = xt_ref[4:5, :]
            dy = xt_ref[5:6, :]
            dz = xt_ref[6:7, :]
            for s in range(st._G):
                o = s * 20
                n0 = g_ref[:, o + 0:o + 1]
                n1 = g_ref[:, o + 1:o + 2]
                n2 = g_ref[:, o + 2:o + 3]
                det = dx * n0 + dy * n1 + dz * n2
                acc_t[:] = jnp.minimum(acc_t[:], det)
            acc_bt[0:1, :] = jnp.min(acc_t[:], axis=0, keepdims=True)

        @pl.when(last & live)
        def _():
            out_ref[0, :] = jnp.min(acc_t[:], axis=0)
            out_ref[1, :] = acc_id[0, :]
            out_ref[2, :] = acc_u[0, :]
            out_ref[3, :] = acc_v[0, :]

    return kernel


def run_variant(kernel_fn, xt_ext, g, tile_of, tminb, tile):
    n_cols = xt_ext.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tile_of.shape[0],),
        in_specs=[
            pl.BlockSpec((16, tile), lambda i, t, tb: (0, t[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 20 * st._G), lambda i, t, tb: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda i, t, tb: (0, t[i]),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, tile), jnp.float32)] * 4
        + [pltpu.VMEM((8, tile), jnp.float32)],
    )
    f = pl.pallas_call(kernel_fn, out_shape=jax.ShapeDtypeStruct(
        (8, n_cols), jnp.float32), grid_spec=grid_spec)
    return jax.jit(f)


tile = 512
nt = 512
chunk = 4096
n_cols = (nt + 1) * tile
key = jax.random.PRNGKey(0)
xt_ext = jax.random.normal(key, (16, n_cols), jnp.float32)
g = jax.random.normal(key, (chunk * 128, 20 * st._G), jnp.float32)
t_of = jnp.asarray(np.repeat(np.arange(chunk // 8), 8)[:chunk]
                   % nt).astype(jnp.int32)
live_thr = jnp.full((chunk,), -2**31 + 1, jnp.int32)   # never done
dead_thr = jnp.full((chunk,), 2**31 - 2, jnp.int32)    # always done

prod = run_variant(st._make_kernel(tile, nt), xt_ext, g, t_of,
                   live_thr, tile)
det = run_variant(make_det_kernel(tile, nt), xt_ext, g, t_of,
                  live_thr, tile)

t_full = timed(lambda: prod(t_of, live_thr, xt_ext, g))
t_skip = timed(lambda: prod(t_of, dead_thr, xt_ext, g))
t_det = timed(lambda: det(t_of, live_thr, xt_ext, g))
log(f"full   : {t_full*1e3:8.2f} ms = {t_full/chunk*1e6:6.2f} us/block")
log(f"det3   : {t_det*1e3:8.2f} ms = {t_det/chunk*1e6:6.2f} us/block")
log(f"skipped: {t_skip*1e3:8.2f} ms = {t_skip/chunk*1e6:6.2f} us/block")
pairs = chunk * 512 * tile
log(f"full: {t_full/pairs*1e12:.1f} ps/pair "
    f"({pairs/t_full/1e12:.2f} Tpairs/s)")
