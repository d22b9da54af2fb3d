#!/usr/bin/env python
"""Experiment: Pallas scalar-prefetch gather vs XLA dynamic-slice gather.

The engine's block gather (concat of dynamic_slice_in_dim per 16-row run)
costs ~2 ms/step in-scan at (800 x 1M): XLA materializes each slice and
then concatenates -- two round trips for 200 MB of batch bytes. A Pallas
kernel with a scalar-prefetched block-index map moves each (TJ tiles,
blk rows, 128 lanes) chunk HBM->HBM in one strided DMA: one round trip.

Resident rows are pre-blocked by blk (the engine's sample_block), so the
row-block index IS the sampled block id -- block-aligned by construction.

Usage: python tools/tune_gather_kernel.py  (TPU)
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
from neural_admixture_tpu.ops.fused import _interpret, pick_tb
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M = int(os.environ.get("PROF_M", 1_000_000))
N = 4096
B = 800
BLK = 16
STEPS = 40
ITERS = 5
m_pad = ((M + 2047) // 2048) * 2048
nT = m_pad // 2048
rng = np.random.default_rng(0)
u32 = rng.integers(0, 2**32, size=(N, m_pad // 16),
                   dtype=np.uint64).astype(np.uint32)
tiles = jax.device_put(np.ascontiguousarray(pk.tiles_from_rows(u32)))
V = jnp.asarray(rng.normal(size=(m_pad, 8)).astype(np.float32) * 0.01)
tb = pick_tb(B)

nb = B // BLK
idx_steps = jnp.asarray(
    rng.integers(0, N // BLK, size=(STEPS, nb), dtype=np.int32))


def gather_xla(t, idx_b):
    return jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(t, idx_b[b] * BLK, BLK, axis=1)
         for b in range(nb)], axis=1)


def make_gather_kernel(TJ):
    def kernel(idx_ref, in_ref, out_ref):
        out_ref[:] = in_ref[:]

    def call(t, idx_b):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb, nT // TJ),
                in_specs=[pl.BlockSpec((TJ, BLK, 128),
                                       lambda i, jj, idx_ref:
                                       (jj, idx_ref[i], 0))],
                out_specs=pl.BlockSpec((TJ, BLK, 128),
                                       lambda i, jj, idx_ref: (jj, i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((nT, B, 128), jnp.uint32),
            interpret=_interpret(),
        )(idx_b, t)
    return call


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    per = (time.time() - t0) / ITERS / STEPS
    print(f"{name:34s} {per*1e3:9.2f} ms/step", flush=True)


def scan_over(gather):
    @jax.jit
    def run(t, v):
        def body(c, idx_b):
            xb = gather(t, idx_b)
            xp = fs._xv_call(xb, v, tb)
            return c + 1e-9 * xp.sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), idx_steps)
        return c
    return run


print(f"B={B} M={M} blk={BLK} nT={nT} steps={STEPS}", flush=True)
timeit("dyn-slice gather + xv", scan_over(gather_xla), tiles, V)
for TJ in (3, 163):  # nT = 489 = 3 * 163
    if nT % TJ:
        continue
    timeit(f"pallas gather (TJ={TJ}) + xv", scan_over(make_gather_kernel(TJ)),
           tiles, V)

# correctness
g0 = np.asarray(gather_xla(tiles, idx_steps[0]))
g1 = np.asarray(make_gather_kernel(3)(tiles, idx_steps[0]))
print(f"max abs diff: {np.abs(g0.astype(np.int64) - g1.astype(np.int64)).max()}")
