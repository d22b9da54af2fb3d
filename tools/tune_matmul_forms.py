#!/usr/bin/env python
"""Experiment: operand layouts / engine choice for the skinny fused-step dots.

Hypotheses at B=800, M=1M, K=D=8, tile (tb, TM):
  (a) xv: the V block (TM, D) puts D=8 on lanes -> 8/128-dense operand tiles.
      Feeding V pre-transposed as (D, m_pad) with (D, TM) dense blocks may
      lower better (same trick as the transposed kernel *outputs*, round 2).
  (b) the decode dot q @ p has contraction k=8 of the MXU's 128 -> padded
      passes. An unrolled rank-k broadcast-FMA on the VPU does
      k mul + (k-1) add per genotype instead; which engine wins is not
      obvious (kernels are otherwise VPU-heavy).

Usage: python tools/tune_matmul_forms.py   (on TPU; ~2 min warm)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_admixture_tpu.ops import fused_step as fs
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.ops.fused import (TM, TW, _GRAD_EPS, _interpret,
                                            _unpack_x, pick_tb)
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M = int(os.environ.get("PROF_M", 1_000_000))
B = int(os.environ.get("PROF_B", 800))
K = int(os.environ.get("PROF_K", 8))
D = 8
ITERS = int(os.environ.get("PROF_ITERS", 10))

m_pad = ((M + 2047) // 2048) * 2048
rng = np.random.default_rng(0)
packed = rng.integers(0, 256, size=(B, m_pad // 4), dtype=np.uint8)
tiles = jnp.asarray(np.ascontiguousarray(
    pk.tiles_from_rows(packed.view("<u4"))))
Q = jnp.asarray(rng.dirichlet(np.ones(K), size=B).astype(np.float32))
P = jnp.asarray(rng.uniform(0.2, 0.8, size=(K, m_pad)).astype(np.float32))
V = jnp.asarray(rng.normal(size=(m_pad, D)).astype(np.float32) * 0.01)
Vt = jnp.asarray(np.ascontiguousarray(np.asarray(V).T))
cm2 = jnp.ones((1, m_pad), jnp.float32)
rw2 = jnp.ones((B, 1), jnp.float32)
tb = pick_tb(B)


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.time() - t0) / ITERS
    print(f"{name:36s} {dt*1e3:9.2f} ms/call", flush=True)
    return dt


# ---------------- (a) xv with transposed V operand --------------------------

def _xv_kernel_vt(no_missing):
    def kernel(u_ref, vt_ref, out_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        x = _unpack_x(u_ref[0], no_missing)
        out_ref[0] += jax.lax.dot_general(
            vt_ref[:], x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return kernel


def xv_vt_call(u32, vt):
    Bc = u32.shape[1]
    xpt = pl.pallas_call(
        _xv_kernel_vt(False),
        grid=(Bc // tb, m_pad // TM),
        in_specs=[
            pl.BlockSpec((1, tb, TW), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, tb), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bc // tb, D, tb), jnp.float32),
        interpret=_interpret(),
    )(u32, vt)
    return xpt.transpose(0, 2, 1).reshape(Bc, D)


# ---------------- (b) decode dot on the VPU ---------------------------------

def _draw_tile_vpu(q, p, x, mask_rw):
    k = q.shape[1]
    raw = q[:, 0:1] * p[0:1, :]
    for i in range(1, k):
        raw = raw + q[:, i:i + 1] * p[i:i + 1, :]
    rec = jnp.clip(raw, 0.0, 1.0)
    denom = jnp.maximum(rec * (1.0 - rec), _GRAD_EPS)
    drec = (rec - x) * pl.reciprocal(denom, approx=True)
    return jnp.where(raw == rec, drec, 0.0) * mask_rw


def _dq_dp_kernel_vpu():
    def kernel(q_ref, p_ref, u_ref, cm_ref, rw_ref, g_ref, dq_ref, dp_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)
        x = _unpack_x(u_ref[0], False)
        mask_rw = cm_ref[:] * rw_ref[:]
        g = g_ref[0, 0]
        q = q_ref[:]
        draw = _draw_tile_vpu(q, p_ref[:], x, mask_rw)
        dqt_blk = jax.lax.dot_general(
            p_ref[:], draw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            dq_ref[i] = dqt_blk

        @pl.when(j > 0)
        def _():
            dq_ref[i] += dqt_blk

        @pl.when(i == 0)
        def _():
            dp_ref[:] = jnp.zeros_like(dp_ref)
        dp_ref[:] += jax.lax.dot_general(
            q * g, draw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return kernel


def dq_dp_vpu_call(q, p, u32, g):
    Bc = u32.shape[1]
    outs = pl.pallas_call(
        _dq_dp_kernel_vpu(),
        grid=(m_pad // TM, Bc // tb),
        in_specs=(fs._q_specs([K], tb, "mb") + fs._p_specs([K], "mb")
                  + (fs._u32_specs(tb, "mb") + fs._mask_specs(tb, "mb"))
                  + [pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                                  memory_space=pltpu.SMEM)]),
        out_specs=([pl.BlockSpec((Bc // tb, K, tb), lambda j, i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)]
                   + [pl.BlockSpec((K, TM), lambda j, i: (0, j),
                                   memory_space=pltpu.VMEM)]),
        out_shape=([jax.ShapeDtypeStruct((Bc // tb, K, tb), jnp.float32)]
                   + [jax.ShapeDtypeStruct((K, m_pad), jnp.float32)]),
        interpret=_interpret(),
    )(q, p, u32, cm2, rw2, jnp.asarray(g, jnp.float32).reshape(1, 1))
    return outs


print(f"shapes: B={B} M={M} m_pad={m_pad} K={K} tb={tb} iters={ITERS}",
      flush=True)

xv0 = jax.jit(lambda u, v: fs._xv_call(u, v, tb))
t0 = timeit("xv current (V (TM,D) blocks)", xv0, tiles, V)
xv1 = jax.jit(xv_vt_call)
t1 = timeit("xv transposed V (D,TM) blocks", xv1, tiles, Vt)
a = np.asarray(xv0(tiles, V))
b = np.asarray(xv1(tiles, Vt))
print(f"  xv max abs diff: {np.abs(a - b).max():.3e}")

dqdp0 = jax.jit(lambda q, p, u, g: fs._dq_dp_call([q], [p], u, cm2, rw2, g,
                                                  tb))
t2 = timeit("dq_dp current (MXU decode dot)", dqdp0, Q, P, tiles,
            jnp.float32(1.0))
dqdp1 = jax.jit(dq_dp_vpu_call)
t3 = timeit("dq_dp VPU rank-k decode", dqdp1, Q, P, tiles, jnp.float32(1.0))
(dq0,), (dp0,) = dqdp0(Q, P, tiles, jnp.float32(1.0))
dq1, dp1 = dqdp1(Q, P, tiles, jnp.float32(1.0))
dq1 = dq1.transpose(0, 2, 1).reshape(B, K)
print(f"  dq rel diff: "
      f"{np.abs(np.asarray(dq0)-np.asarray(dq1)).max()/np.abs(np.asarray(dq0)).max():.3e}"
      f"  dp rel diff: "
      f"{np.abs(np.asarray(dp0)-np.asarray(dp1)).max()/np.abs(np.asarray(dp0)).max():.3e}")
