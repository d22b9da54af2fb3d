#!/usr/bin/env python
"""Micro-bench: in-kernel unpack cost and tile-size sensitivity.

Measures (1) an unpack+reduce-only kernel (the VPU floor for any pass over
the packed plane), (2) the dq-style kernel, at several batch-tile sizes.
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

from neural_admixture_tpu.ops.fused import TM, TW, _draw_tile, _unpack_x
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M = int(os.environ.get("TU_M", 1_000_000))
B = int(os.environ.get("TU_B", 800))
K = 8
ITERS = int(os.environ.get("TU_ITERS", 10))
m_pad = ((M + 2047) // 2048) * 2048

rng = np.random.default_rng(0)
u32 = jnp.asarray(rng.integers(0, 2**32, size=(B, m_pad // 16),
                               dtype=np.uint64).astype(np.uint32))
Q = jnp.asarray(rng.dirichlet(np.ones(K), size=B).astype(np.float32))
P = jnp.asarray(rng.uniform(0.2, 0.8, size=(K, m_pad)).astype(np.float32))


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.time() - t0) / ITERS
    gbps = (B * m_pad / 4) / dt / 1e9
    print(f"{name:34s} {dt*1e3:8.2f} ms  ({gbps:6.1f} GB/s packed)",
          flush=True)


def unpack_sum_kernel(u_ref, out_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        out_ref[0, 0] = 0.0
    x = _unpack_x(u_ref[:])
    out_ref[0, 0] += jnp.sum(x)


def raw_sum_kernel(u_ref, out_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        out_ref[0, 0] = 0.0
    # no unpack: just touch the bytes
    out_ref[0, 0] += jnp.sum(u_ref[:].astype(jnp.int32).astype(jnp.float32))


def dq_kernel(q_ref, p_ref, u_ref, dq_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)
    x = _unpack_x(u_ref[:])
    draw = _draw_tile(q_ref[:], p_ref[:], x, 1.0)
    dq_ref[:] += jax.lax.dot_general(
        draw, p_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def mk_scalar(kernel, tb):
    return jax.jit(lambda u: pl.pallas_call(
        kernel,
        grid=(B // tb, m_pad // TM),
        in_specs=[pl.BlockSpec((tb, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(u))


def mk_dq(tb):
    return jax.jit(lambda q, p, u: pl.pallas_call(
        dq_kernel,
        grid=(B // tb, m_pad // TM),
        in_specs=[
            pl.BlockSpec((tb, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, TW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, K), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
    )(q, p, u))


print(f"B={B} m_pad={m_pad} iters={ITERS}", flush=True)
for tb in (8, 40, 200, 400, 800):
    if B % tb:
        continue
    timeit(f"raw byte sum      tb={tb}", mk_scalar(raw_sum_kernel, tb), u32)
    timeit(f"unpack+sum        tb={tb}", mk_scalar(unpack_sum_kernel, tb), u32)
    timeit(f"dq (unpack+draw)  tb={tb}", mk_dq(tb), Q, P, u32)
