#!/usr/bin/env python
"""Experiment: transpose the remaining skinny KERNEL OPERANDS.

After the V-operand win (tools/tune_matmul_forms.py), the same 8/128-lane
sparsity remains on: q (tb, k=8) in the dq_dp and loss kernels, and dxp
(tb, D=8) in the dv kernel. Variants feed them transposed -- (k, B) /
(D, B) with dense (k, tb) / (D, tb) blocks -- with the dot_generals
re-contracted accordingly.

Usage: python tools/tune_qt.py  (TPU)
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
K = 8
D = 8
ITERS = 10

m_pad = ((M + 2047) // 2048) * 2048
rng = np.random.default_rng(0)
packed = rng.integers(0, 256, size=(B, m_pad // 4), dtype=np.uint8)
tiles = jnp.asarray(np.ascontiguousarray(
    pk.tiles_from_rows(packed.view("<u4"))))
Q = jnp.asarray(rng.dirichlet(np.ones(K), size=B).astype(np.float32))
# (nB, K, tb): small dim on sublanes, full-width tb on lanes (Mosaic
# needs last-dim blocks either 128-multiples or full width)
NB = None  # set after tb known
P = jnp.asarray(rng.uniform(0.2, 0.8, size=(K, m_pad)).astype(np.float32))
dxp = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

cm2 = jnp.ones((1, m_pad), jnp.float32)
rw2 = jnp.ones((B, 1), jnp.float32)
tb = pick_tb(B)
NB = B // tb
Qt = jnp.asarray(np.ascontiguousarray(
    np.asarray(Q).reshape(NB, tb, K).transpose(0, 2, 1)))
dxpt = jnp.asarray(np.ascontiguousarray(
    np.asarray(dxp).reshape(NB, tb, D).transpose(0, 2, 1)))


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


# ------------------- dq_dp with transposed q operand ------------------------

def _draw_tile_qt(qt, p, x, mask_rw):
    raw = jax.lax.dot_general(qt, p, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    rec = jnp.clip(raw, 0.0, 1.0)
    denom = jnp.maximum(rec * (1.0 - rec), _GRAD_EPS)
    drec = (rec - x) * pl.reciprocal(denom, approx=True)
    return jnp.where(raw == rec, drec, 0.0) * mask_rw


def _dq_dp_kernel_qt():
    def kernel(qt_ref, p_ref, u_ref, cm_ref, rw_ref, g_ref, dq_ref, dp_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)
        x = _unpack_x(u_ref[0], False)
        mask_rw = cm_ref[:] * rw_ref[:]
        g = g_ref[0, 0]
        qt = qt_ref[0]
        draw = _draw_tile_qt(qt, p_ref[:], x, mask_rw)
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
            qt * g, draw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return kernel


def dq_dp_qt_call(qt, p, u32, g):
    outs = pl.pallas_call(
        _dq_dp_kernel_qt(),
        grid=(m_pad // TM, B // tb),
        in_specs=([pl.BlockSpec((1, K, tb), lambda j, i: (i, 0, 0),
                                memory_space=pltpu.VMEM)]
                  + fs._p_specs([K], "mb") + (fs._u32_specs(tb, "mb") + fs._mask_specs(tb, "mb"))
                  + [pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                                  memory_space=pltpu.SMEM)]),
        out_specs=([pl.BlockSpec((B // tb, K, tb), lambda j, i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)]
                   + [pl.BlockSpec((K, TM), lambda j, i: (0, j),
                                   memory_space=pltpu.VMEM)]),
        out_shape=([jax.ShapeDtypeStruct((B // tb, K, tb), jnp.float32)]
                   + [jax.ShapeDtypeStruct((K, m_pad), jnp.float32)]),
        interpret=_interpret(),
    )(qt, p, u32, cm2, rw2, jnp.asarray(g, jnp.float32).reshape(1, 1))
    return outs


# ------------------- dv with transposed dxp operand -------------------------

def _dvt_kernel_t():
    def kernel(u_ref, dxpt_ref, dvt_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            dvt_ref[:] = jnp.zeros_like(dvt_ref)
        x = _unpack_x(u_ref[0], False)
        dvt_ref[:] += jax.lax.dot_general(
            dxpt_ref[0], x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return kernel


def dv_t_call(u32, dxpt):
    dvt = pl.pallas_call(
        _dvt_kernel_t(),
        grid=(m_pad // TM, B // tb),
        in_specs=[
            pl.BlockSpec((1, tb, TW), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, tb), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, TM), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, m_pad), jnp.float32),
        interpret=_interpret(),
    )(u32, dxpt)
    return dvt


# ------------------- loss with transposed q operand -------------------------

def _loss_kernel_qt():
    def kernel(qt_ref, p_ref, u_ref, cm_ref, rw_ref, out_ref):
        @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
        def _():
            out_ref[0, 0] = 0.0
        x = _unpack_x(u_ref[0], False)
        mask_rw = cm_ref[:] * rw_ref[:]
        raw = jax.lax.dot_general(qt_ref[0], p_ref[:],
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        rec = jnp.clip(raw, 0.0, 1.0)
        logr = jnp.maximum(jnp.log(rec), -100.0)
        log1mr = jnp.maximum(jnp.log1p(-rec), -100.0)
        out_ref[0, 0] += jnp.sum(-(x * logr + (1.0 - x) * log1mr) * mask_rw)
    return kernel


def loss_qt_call(qt, p, u32):
    out = pl.pallas_call(
        _loss_kernel_qt(),
        grid=(B // tb, m_pad // TM),
        in_specs=([pl.BlockSpec((1, K, tb), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)]
                  + fs._p_specs([K]) + (fs._u32_specs(tb) + fs._mask_specs(tb))),
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=_interpret(),
    )(qt, p, u32, cm2, rw2)
    return out[0, 0]


print(f"shapes: B={B} M={M} m_pad={m_pad} K={K} tb={tb} iters={ITERS}",
      flush=True)

dqdp0 = jax.jit(lambda q, p, u, g: fs._dq_dp_call([q], [p], u, cm2, rw2, g,
                                                  tb))
timeit("dq_dp current (q (tb,k) blocks)", dqdp0, Q, P, tiles, jnp.float32(1.0))
dqdp1 = jax.jit(dq_dp_qt_call)
timeit("dq_dp transposed q (k,tb) blocks", dqdp1, Qt, P, tiles,
       jnp.float32(1.0))
(dq0,), (dp0,) = dqdp0(Q, P, tiles, jnp.float32(1.0))
dq1, dp1 = dqdp1(Qt, P, tiles, jnp.float32(1.0))
print(f"  dq max abs diff: "
      f"{np.abs(np.asarray(dq0) - np.asarray(dq1)).max():.3e}"
      f"   dp max abs diff: {np.abs(np.asarray(dp0) - np.asarray(dp1)).max():.3e}")

dv0 = jax.jit(lambda u, dx: fs._dv_call(u, dx, tb))
timeit("dv current (dxp (tb,D) blocks)", dv0, tiles, dxp)
dv1 = jax.jit(dv_t_call)
timeit("dv transposed dxp (D,tb) blocks", dv1, tiles, dxpt)
a = np.asarray(dv0(tiles, dxp))
b = np.asarray(dv1(tiles, dxpt)).T
print(f"  dv max abs diff: {np.abs(a - b).max():.3e}")

loss0 = jax.jit(lambda q, p, u: fs._loss_call([q], [p], u, cm2, rw2, tb))
timeit("loss current (q (tb,k) blocks)", loss0, Q, P, tiles)
loss1 = jax.jit(loss_qt_call)
timeit("loss transposed q (k,tb) blocks", loss1, Qt, P, tiles)
print(f"  loss diff: {float(loss0(Q, P, tiles)) - float(loss1(Qt, P, tiles)):.3e}")
