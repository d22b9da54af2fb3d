#!/usr/bin/env python
"""Experiment: read sampled blocks straight from the resident array.

tools/tune_gather2.py showed the batch gather costs ~1.7 ms/step even for
a CONTIGUOUS slice -- the materialized copy is the overhead, not sampling
randomness. The fix candidate: drop the copy entirely and let each Pallas
pass read the sampled blocks directly from the resident (nT, R, TW) array
via scalar-prefetch index maps (PrefetchScalarGridSpec): batch grid dim =
B/blk, u32 block (1, blk, TW) at dynamic row-block offset idx[i].

All legs are IN-SCAN with per-step offsets coming from scanned xs and a
live carry, so XLA cannot hoist a loop-invariant kernel out of the scan
(that artifact produced the bogus 0.15 ms "staged" floor in tune_gather2).

Usage: python tools/tune_gather3.py  (TPU)
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

from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.ops.fused import TM, TW, _unpack_x, pick_tb
from neural_admixture_tpu.ops.fused_step import _xv_call
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M = int(os.environ.get("PROF_M", 1_000_000))
R = 4096          # resident rows
B = 800
D = 8
STEPS = 40
ITERS = 5
m_pad = ((M + TM - 1) // TM) * TM
nT = m_pad // TM
rng = np.random.default_rng(0)
u32 = rng.integers(0, 2**32, size=(R, m_pad // 16),
                   dtype=np.uint64).astype(np.uint32)
tiles = jax.device_put(np.ascontiguousarray(pk.tiles_from_rows(u32)))
V = jax.device_put(rng.normal(size=(m_pad, D)).astype(np.float32) * 0.01)


def xv_indexed(resident, vt, blk_idx, blk):
    """Xp^T blocks straight from the resident array: no gathered batch.

    blk_idx: (nbk,) int32 block ids (units of blk rows, block-aligned --
    exactly what engine block sampling produces)."""
    nbk = blk_idx.shape[0]

    def kernel(idx_ref, u_ref, vt_ref, out_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        x = _unpack_x(u_ref[0], True)
        out_ref[0] += jax.lax.dot_general(
            vt_ref[:], x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbk, nT),
        in_specs=[
            pl.BlockSpec((1, blk, TW), lambda i, j, idx: (j, idx[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TM), lambda i, j, idx: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, blk), lambda i, j, idx: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    xpt = pl.pallas_call(
        kernel, grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((nbk, D, blk), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nbk * blk * m_pad * D,
            bytes_accessed=nbk * blk * m_pad // 4, transcendentals=0),
    )(blk_idx, resident, vt)
    return xpt.transpose(0, 2, 1).reshape(nbk * blk, D)


def timeit_scan(name, step_fn, idxs):
    def body(carry, idx_t):
        return carry + step_fn(idx_t), None

    run = jax.jit(lambda c, xs: jax.lax.scan(body, c, xs)[0])
    c = run(jnp.float32(0), idxs)
    float(c)
    t0 = time.time()
    for _ in range(ITERS):
        c = run(jnp.float32(0), idxs)
    float(c)
    per = (time.time() - t0) / ITERS / STEPS
    print(f"{name:40s} {per*1e3:9.2f} ms/step", flush=True)


print(f"B={B} R={R} M={M} steps={STEPS}", flush=True)

for blk in (16, 32, 64, 128):
    nbk = B // blk if B % blk == 0 else (B // blk + 1)
    b_eff = nbk * blk
    key = jax.random.PRNGKey(0)
    idxs = jax.random.randint(key, (STEPS, nbk), 0, R // blk, jnp.int32)

    vt = V.T

    def leg_indexed(idx_t, blk=blk):
        return jnp.sum(xv_indexed(tiles, vt, idx_t, blk))

    def leg_gather(idx_t, blk=blk, nbk=nbk):
        xb = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(tiles, idx_t[b] * blk, blk, axis=1)
             for b in range(nbk)], axis=1)
        return jnp.sum(_xv_call(xb, V, pick_tb(xb.shape[1]), True))

    timeit_scan(f"indexed xv blk={blk} (B={b_eff})", leg_indexed, idxs)
    timeit_scan(f"gather+xv blk={blk} (B={b_eff})", leg_gather, idxs)
