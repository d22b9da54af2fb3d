#!/usr/bin/env python
"""Plane-wise dq kernel: no concat; all math per (tb, 128) bit-plane."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_admixture_tpu.ops.fused import TW, _draw_tile, _unpack_x
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M_PAD = 1001472
B = 800
K = 8
NT = M_PAD // 2048
ITERS = 10
TB = 200
rng = np.random.default_rng(0)
u32 = rng.integers(0, 2**32, size=(B, M_PAD // 16),
                   dtype=np.uint64).astype(np.uint32)
tiles = jax.device_put(np.ascontiguousarray(pk.tiles_from_rows(u32)))
Q = jnp.asarray(rng.dirichlet(np.ones(K), size=B).astype(np.float32))
P = jnp.asarray(rng.uniform(0.2, 0.8, size=(K, M_PAD)).astype(np.float32))


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(out))
    print(f"{name:44s} {(time.time()-t0)/ITERS*1e3:8.2f} ms", flush=True)
    return out


def dq_concat_kernel(q_ref, p_ref, u_ref, dq_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)
    x = _unpack_x(u_ref[0])
    draw = _draw_tile(q_ref[:], p_ref[:], x, 1.0)
    dq_ref[:] += jax.lax.dot_general(
        draw, p_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def dq_plane_kernel(q_ref, p_ref, u_ref, dq_ref):
    """P tile given as (K, 1, 16, 128); all per-plane math stays (tb, 128)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)
    u = u_ref[0]                              # (tb, 128) uint32
    q = q_ref[:]
    acc = jnp.zeros_like(dq_ref)
    for b in range(16):
        g = ((u >> jnp.uint32(2 * b)) & jnp.uint32(3)).astype(jnp.int32)
        x = jnp.where(g == 3, 0.0, g.astype(jnp.float32) * 0.5)
        p_b = p_ref[:, 0, b, :]               # (K, 128)
        raw = jnp.dot(q, p_b, preferred_element_type=jnp.float32)
        rec = jnp.clip(raw, 0.0, 1.0)
        denom = jnp.maximum(rec * (1.0 - rec), 1e-12)
        drec = (rec - x) * pl.reciprocal(denom, approx=True)
        draw = jnp.where(jnp.logical_and(raw >= 0.0, raw <= 1.0), drec, 0.0)
        acc += jax.lax.dot_general(
            draw, p_b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    dq_ref[:] += acc


def mk_concat():
    return jax.jit(lambda q, p, t: pl.pallas_call(
        dq_concat_kernel,
        grid=(B // TB, NT),
        in_specs=[
            pl.BlockSpec((TB, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 2048), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, TW), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, K), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
    )(q, p, t))


def mk_plane():
    return jax.jit(lambda q, p, t: pl.pallas_call(
        dq_plane_kernel,
        grid=(B // TB, NT),
        in_specs=[
            pl.BlockSpec((TB, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, 16, 128), lambda i, j: (0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, TW), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, K), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
    )(q, p, t))


ref = timeit("dq concat (current)", mk_concat(), Q, P, tiles)
P4 = jnp.asarray(np.ascontiguousarray(
    np.asarray(P).reshape(K, NT, 16, 128)))
out = timeit("dq plane-wise", mk_plane(), Q, P4, tiles)
print("max abs diff:", float(jnp.max(jnp.abs(out - ref))))
