#!/usr/bin/env python
"""MXU offload experiment (VERDICT r3 #6): can the four linear-form
dots (det, t*det, u*det, v*det) run faster as MXU matmuls than as VPU
elementwise chains?

Formulation: per 768-ref block, C (4*768, 16) coefficient rows (output-
major: rows [0,768) = det coeffs, ...), phi (16, 512) ray features ->
OUT (3072, 512) in one jnp.dot. K=16 << 128 so the systolic array runs
at 12.5% utilization; bf16x3 (accuracy recovery) triples passes.

Three kernels over identical work (B blocks x 512 rays):
  vpu   — the production linear-form VPU body (dots only, no epilogue)
  mxu1  — single-pass bf16 matmul (known ~1% flipped hits at scale)
  mxu3  — bf16x3 error-compensated (hi/lo split, 3 matmuls)
Numbers are per-block microseconds; accuracy vs f64 reference.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from hagrid_tpu.utils import cache

cache.enable()

B = 2048          # blocks
TILE = 512
G = 6


def timed_chain(step, x0, warmup=1, iters=3, chain=24):
    """Chained, honest timing (docs/ARCHITECTURE.md): fresh-value inputs
    alone did NOT defeat the tunnel's dispatch memoization (13 ns/block
    'results'), each dispatch's input depends on the previous output —
    forcing real sequential execution — and the sync is a D2H read
    (block_until_ready returns early on this tunnel: 20 ns/block
    'results' even chained)."""
    x = x0
    for _ in range(warmup):
        x = step(x)
    float(jax.device_get(x[0, 0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain):
            x = step(x)
        float(jax.device_get(x[0, 0]))
        ts.append((time.perf_counter() - t0) / chain)
    return float(np.median(ts))


rng = np.random.default_rng(0)
# g blocks: (B*128, 128) like cols; 6 refs x 20 coeffs per row.
g = jnp.asarray(rng.standard_normal((B * 128, 128)), jnp.float32)
xt = jnp.asarray(rng.standard_normal((16, TILE)), jnp.float32)
# C layout for the MXU form: (B*3072, 16) output-major coeff rows.
c = jnp.asarray(rng.standard_normal((B * 4 * 768, 16)), jnp.float32)
phi = jnp.asarray(rng.standard_normal((16, TILE)), jnp.float32)


def vpu_kernel(xt_ref, g_ref, out_ref):
    ox, oy, oz = xt_ref[1:2, :], xt_ref[2:3, :], xt_ref[3:4, :]
    dx, dy, dz = xt_ref[4:5, :], xt_ref[5:6, :], xt_ref[6:7, :]
    mx, my, mz = xt_ref[7:8, :], xt_ref[8:9, :], xt_ref[9:10, :]
    acc = jnp.zeros((128, TILE), jnp.float32)
    for s in range(G):
        o = s * 20
        n0, n1, n2 = (g_ref[:, o + k:o + k + 1] for k in range(3))
        b0, b1, b2 = (g_ref[:, o + k:o + k + 1] for k in range(3, 6))
        c0, c1, c2 = (g_ref[:, o + k:o + k + 1] for k in range(6, 9))
        d0, d1, d2 = (g_ref[:, o + k:o + k + 1] for k in range(9, 12))
        e0, e1, e2 = (g_ref[:, o + k:o + k + 1] for k in range(12, 15))
        f = g_ref[:, o + 15:o + 16]
        det = dx * n0 + dy * n1 + dz * n2
        tt = f - (ox * n0 + oy * n1 + oz * n2)
        uu = mx * b0 + my * b1 + mz * b2 + dx * c0 + dy * c1 + dz * c2
        vv = mx * d0 + my * d1 + mz * d2 + dx * e0 + dy * e1 + dz * e2
        acc = acc + det + tt + uu + vv  # keep all four live
    out_ref[:] = acc


def mxu1_kernel(phi_ref, c_ref, out_ref):
    pb = phi_ref[:].astype(jnp.bfloat16)
    acc = jnp.zeros((128, TILE), jnp.float32)
    # chunk the matmul to keep VMEM intermediates < 1.5MB
    for r in range(0, 3072, 768):
        cb = c_ref[r:r + 768, :].astype(jnp.bfloat16)
        out = jnp.dot(cb, pb, preferred_element_type=jnp.float32)
        for q in range(0, 768, 128):
            acc = acc + out[q:q + 128, :]
    out_ref[:] = acc


def mxu3_kernel(phi_ref, c_ref, out_ref):
    pf = phi_ref[:]
    ph = pf.astype(jnp.bfloat16)
    plo = (pf - ph.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.zeros((128, TILE), jnp.float32)
    for r in range(0, 3072, 768):
        cf = c_ref[r:r + 768, :]
        ch = cf.astype(jnp.bfloat16)
        cl = (cf - ch.astype(jnp.float32)).astype(jnp.bfloat16)
        out = (jnp.dot(ch, ph, preferred_element_type=jnp.float32)
               + jnp.dot(ch, plo, preferred_element_type=jnp.float32)
               + jnp.dot(cl, ph, preferred_element_type=jnp.float32))
        for q in range(0, 768, 128):
            acc = acc + out[q:q + 128, :]
    out_ref[:] = acc


@jax.jit
def run_vpu(xt, g):
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(B,),
        in_specs=[pl.BlockSpec((16, TILE), lambda i: (0, 0)),
                  pl.BlockSpec((128, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((128, TILE), lambda i: (0, 0)))
    return pl.pallas_call(
        vpu_kernel, out_shape=jax.ShapeDtypeStruct((128, TILE),
                                                   jnp.float32),
        grid_spec=spec)(xt, g)


def run_mxu(kernel):
    @jax.jit
    def f(phi, c):
        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(B,),
            in_specs=[pl.BlockSpec((16, TILE), lambda i: (0, 0)),
                      pl.BlockSpec((3072, 16), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((128, TILE), lambda i: (0, 0)))
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((128, TILE),
                                                   jnp.float32),
            grid_spec=spec)(phi, c)
    return f


def mk_chain(f, table):
    """One jitted step: dispatch f, fold a tiny slice of the output back
    into the 16-row input so the next dispatch depends on this one. The
    big coefficient table rides as an ARGUMENT (a closure capture gets
    embedded as an HLO constant -> remote_compile HTTP 413)."""
    @jax.jit
    def step2(x, tab):
        out = f(x, tab)
        # Bounded but bit-changing feedback: 1e-12 underflows in f32
        # (inputs repeat bitwise -> the tunnel memoizes the dispatch
        # and reports 11 ns/block), so feed back a normalized slice.
        fb = out[:x.shape[0], :]
        return x + 1e-4 * fb / (1.0 + jnp.abs(fb))

    return lambda x: step2(x, table)


t = timed_chain(mk_chain(run_vpu, g), xt)
print(f"vpu  dots: {t * 1e3:8.3f} ms total = {t * 1e9 / B:7.0f} ns/block",
      flush=True)
for name, k in (("mxu1", mxu1_kernel), ("mxu3", mxu3_kernel)):
    f = run_mxu(k)
    t = timed_chain(mk_chain(f, c), phi)
    print(f"{name} dots: {t * 1e3:8.3f} ms total = "
          f"{t * 1e9 / B:7.0f} ns/block", flush=True)

# Accuracy of the bf16 forms on realistic MT magnitudes.
cs = np.asarray(c[:3072], np.float64)
ps = np.asarray(phi, np.float64)
ref = cs @ ps
h1 = (np.asarray(c[:3072], np.float32).astype(np.float32))
b1 = h1.astype(jnp.bfloat16).astype(np.float32) @ \
    np.asarray(phi, np.float32).astype(jnp.bfloat16).astype(np.float32)
ch = h1.astype(jnp.bfloat16).astype(np.float32)
cl = (h1 - ch).astype(jnp.bfloat16).astype(np.float32)
pf = np.asarray(phi, np.float32)
ph = pf.astype(jnp.bfloat16).astype(np.float32)
plo = (pf - ph).astype(jnp.bfloat16).astype(np.float32)
b3 = ch @ ph + ch @ plo + cl @ ph
print(f"rel err bf16x1: {np.abs(b1 - ref).max() / np.abs(ref).max():.2e}")
print(f"rel err bf16x3: {np.abs(b3 - ref).max() / np.abs(ref).max():.2e}")
