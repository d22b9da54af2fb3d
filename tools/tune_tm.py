#!/usr/bin/env python
"""Micro-bench: DMA efficiency vs (tb, TM) tile shape for the packed plane."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M_PAD = 1001472  # ~1M SNPs padded; 62592 u32 words
B = 800
ITERS = 10
rng = np.random.default_rng(0)
u32_np = rng.integers(0, 2**32, size=(B, M_PAD // 16),
                      dtype=np.uint64).astype(np.uint32)
u32 = jnp.asarray(u32_np)
# tile-major layout: (nT, B, 128) contiguous per (tile, row-block)
TILE_W = 128
tiles = jnp.asarray(np.ascontiguousarray(
    u32_np.reshape(B, -1, TILE_W).transpose(1, 0, 2)))


def timeit(name, fn, *args):
    out = fn(*args)
    float(out[0, 0])
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(out[0, 0])
    dt = (time.time() - t0) / ITERS
    gbps = (B * M_PAD / 4) / dt / 1e9
    print(f"{name:36s} {dt*1e3:8.2f} ms  ({gbps:6.1f} GB/s packed)",
          flush=True)


def raw_sum_kernel(u_ref, out_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        out_ref[0, 0] = 0.0
    out_ref[0, 0] += jnp.sum(u_ref[:].astype(jnp.int32).astype(jnp.float32))


def mk(tb, tw):
    W4 = M_PAD // 16
    return jax.jit(lambda u: pl.pallas_call(
        raw_sum_kernel,
        grid=(B // tb, W4 // tw),
        in_specs=[pl.BlockSpec((tb, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(u))


def tiled_sum_kernel(u_ref, out_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        out_ref[0, 0] = 0.0
    out_ref[0, 0] += jnp.sum(u_ref[0].astype(jnp.int32).astype(jnp.float32))


def mk_tiled(tb):
    nT = M_PAD // 2048
    return jax.jit(lambda t: pl.pallas_call(
        tiled_sum_kernel,
        grid=(B // tb, nT),
        in_specs=[pl.BlockSpec((1, tb, TILE_W), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(t))


print(f"B={B} words={M_PAD // 16}", flush=True)
for tb, tw in ((200, 128), (200, 512), (100, 1024), (40, 2048), (8, 7824),
               (800, 512), (400, 1024)):
    if B % tb or (M_PAD // 16) % tw:
        print(f"# skip tb={tb} tw={tw}")
        continue
    timeit(f"row-major  tb={tb:4d} tw={tw:5d}", mk(tb, tw), u32)
for tb in (200, 400, 800):
    timeit(f"tile-major tb={tb:4d} (1,tb,128)", mk_tiled(tb), tiles)
