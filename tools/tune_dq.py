#!/usr/bin/env python
"""dq-kernel variants: batch-tile size, tiles-per-iteration, dim semantics."""
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
ITERS = 10
NT = M_PAD // 2048
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
    dt = (time.time() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)


def mk(tb, nt, semantics=None):
    tm = 2048 * nt

    def kernel(q_ref, p_ref, u_ref, dq_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            dq_ref[:] = jnp.zeros_like(dq_ref)
        xs = [_unpack_x(u_ref[t]) for t in range(nt)]
        x = jnp.concatenate(xs, axis=-1) if nt > 1 else xs[0]
        draw = _draw_tile(q_ref[:], p_ref[:], x, 1.0)
        dq_ref[:] += jax.lax.dot_general(
            draw, p_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    params = {}
    if semantics:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics)
    return jax.jit(lambda q, p, t: pl.pallas_call(
        kernel,
        grid=(B // tb, NT // nt),
        in_specs=[
            pl.BlockSpec((tb, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, tb, TW), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, K), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
        **params,
    )(q, p, t))


print(f"B={B} NT={NT}", flush=True)
timeit("dq tb=200 nt=1 (current)", mk(200, 1), Q, P, tiles)
timeit("dq tb=200 nt=1 parallel/arbitrary",
       mk(200, 1, ("parallel", "arbitrary")), Q, P, tiles)
timeit("dq tb=400 nt=1", mk(400, 1), Q, P, tiles)
timeit("dq tb=200 nt=2", mk(200, 2), Q, P, tiles)
timeit("dq tb=400 nt=2", mk(400, 2), Q, P, tiles)
timeit("dq tb=800 nt=1", mk(800, 1), Q, P, tiles)
