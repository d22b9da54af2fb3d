#!/usr/bin/env python
"""Does replacing the BCE-backward division with approx reciprocal pay?"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_admixture_tpu.ops.fused import TW, _unpack_x
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M_PAD = 1001472
B = 800
K = 8
NT = M_PAD // 2048
ITERS = 10
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
    print(f"{name:40s} {(time.time()-t0)/ITERS*1e3:8.2f} ms", flush=True)
    return out


def mk(mode):
    def kernel(q_ref, p_ref, u_ref, dq_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            dq_ref[:] = jnp.zeros_like(dq_ref)
        x = _unpack_x(u_ref[0])
        raw = jnp.dot(q_ref[:], p_ref[:], preferred_element_type=jnp.float32)
        rec = jnp.clip(raw, 0.0, 1.0)
        denom = jnp.maximum(rec * (1.0 - rec), 1e-12)
        if mode == "div":
            drec = (rec - x) / denom
        elif mode == "recip_approx":
            drec = (rec - x) * pl.reciprocal(denom, approx=True)
        else:
            drec = (rec - x) * pl.reciprocal(denom, approx=False)
        inside = jnp.logical_and(raw >= 0.0, raw <= 1.0)
        draw = jnp.where(inside, drec, 0.0)
        dq_ref[:] += jax.lax.dot_general(
            draw, p_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    tb = 200
    return jax.jit(lambda q, p, t: pl.pallas_call(
        kernel,
        grid=(B // tb, NT),
        in_specs=[
            pl.BlockSpec((tb, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 2048), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, TW), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, K), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
    )(q, p, t))


ref = timeit("dq with true division", mk("div"), Q, P, tiles)
a = timeit("dq with approx reciprocal", mk("recip_approx"), Q, P, tiles)
e = timeit("dq with exact reciprocal", mk("recip_exact"), Q, P, tiles)
ra = np.abs(np.asarray(a) - np.asarray(ref)) / (np.abs(np.asarray(ref)) + 1e-6)
re = np.abs(np.asarray(e) - np.asarray(ref)) / (np.abs(np.asarray(ref)) + 1e-6)
print("approx rel err: max", float(ra.max()), "mean", float(ra.mean()))
print("exact rel err: max", float(re.max()), "mean", float(re.mean()))
