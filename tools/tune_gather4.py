#!/usr/bin/env python
"""Experiment: grid-step fixed cost, large-tb xv, multi-operand indexed xv.

tune_gather3/idx_diag sweeps showed per-pass cost tracks the GRID-STEP
COUNT (~0.4-0.5 us fixed per step: 8.10/2.27/1.38 ms at 24450/5868/2934
steps), not DMA size. Two consequences tested here, in-scan with
carry-dependent operands and the resident array as an explicit jit arg
(a closed-over 1GB operand makes the scan compile hang for 20+ min):

  A. gathered xv at tb=200 (the then-current pick_tb cap; since raised to
     400 single-head / 256 multi-head) vs 400/800 -- fewer grid steps.
  B. indexed (gather-free) xv reading G sampled blk=16 blocks per grid
     step (G scattered DMAs, concat on sublanes, one dot) -- keeps
     sampling granularity at 16 rows while matching the gathered path's
     grid-step count.

Usage: python tools/tune_gather4.py  (TPU)
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
from neural_admixture_tpu.ops.fused import TM, TW, _unpack_x
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M = int(os.environ.get("PROF_M", 1_000_000))
R = 4096
D = 8
STEPS = 40
ITERS = 5
m_pad = ((M + TM - 1) // TM) * TM
nT = m_pad // TM
rng = np.random.default_rng(0)
u32 = rng.integers(0, 2**32, size=(R, m_pad // 16),
                   dtype=np.uint64).astype(np.uint32)
tiles = jax.device_put(np.ascontiguousarray(pk.tiles_from_rows(u32)))
tiles.block_until_ready()
V = jax.device_put(rng.normal(size=(m_pad, D)).astype(np.float32) * 0.01)
vt = jnp.asarray(V.T)


def xv_kernel(u_ref, vt_ref, out_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    x = _unpack_x(u_ref[0], True)
    out_ref[0] += jax.lax.dot_general(
        vt_ref[:], x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def gathered_xv(tb):
    def call(xb):
        B = xb.shape[1]
        return pl.pallas_call(
            xv_kernel, grid=(B // tb, nT),
            in_specs=[pl.BlockSpec((1, tb, TW), lambda i, j: (j, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((D, TM), lambda i, j: (0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, D, tb), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B // tb, D, tb), jnp.float32),
        )(xb, vt)
    return call


def indexed_xv(blk, G, n_steps):
    """Grid (n_steps, nT); each step DMAs G scattered (1, blk, TW) blocks
    [ids idx[i*G+m]], concatenates on sublanes, one (D, TM)x(G*blk, TM)^T
    dot into a (1, D, G*blk) resident-output block."""
    def kernel(idx_ref, *refs):
        u_refs = refs[:G]
        vt_ref, out_ref = refs[G:]

        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        x = jnp.concatenate([_unpack_x(u[0], True) for u in u_refs], axis=0)
        out_ref[0] += jax.lax.dot_general(
            vt_ref[:], x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps, nT),
        in_specs=([pl.BlockSpec((1, blk, TW),
                                (lambda i, j, idx, m=m: (j, idx[i * G + m], 0)),
                                memory_space=pltpu.VMEM) for m in range(G)]
                  + [pl.BlockSpec((D, TM), lambda i, j, idx: (0, j),
                                  memory_space=pltpu.VMEM)]),
        out_specs=pl.BlockSpec((1, D, G * blk), lambda i, j, idx: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel, grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((n_steps, D, G * blk), jnp.float32))

    def f(blk_idx, resident):
        return call(blk_idx, *([resident] * G), vt)
    return f


def timeit_scan(name, make_step):
    """make_step() -> (step_fn(carry, idx_t) -> scalar, idxs)."""
    step_fn, idxs = make_step()

    @jax.jit
    def run(tiles_arg, idxs):
        def body(acc, idx_t):
            return acc + step_fn(tiles_arg, idx_t, acc), None
        return jax.lax.scan(body, jnp.float32(0), idxs)[0]

    c = run(tiles, idxs)
    float(c)
    t0 = time.time()
    for _ in range(ITERS):
        c = run(tiles, idxs)
    float(c)
    per = (time.time() - t0) / ITERS / STEPS
    print(f"{name:44s} {per*1e3:9.2f} ms/step", flush=True)


print(f"R={R} M={M} steps={STEPS}", flush=True)

# A: gathered xv, tb sweep (dyn-slice blk=16 gather included for reference)
for tb in (200, 400, 800):
    def mk(tb=tb):
        blk = 16
        nbk = 800 // blk
        idxs = jnp.asarray(rng.integers(0, R // blk, size=(STEPS, nbk)),
                           jnp.int32)
        call = gathered_xv(tb)

        def step(tiles_arg, idx_t, acc):
            xb = jnp.concatenate(
                [jax.lax.dynamic_slice_in_dim(tiles_arg, idx_t[b] * blk,
                                              blk, axis=1)
                 for b in range(idx_t.shape[0])], axis=1)
            return jnp.sum(call(xb)) + acc * 1e-38
        return step, idxs
    timeit_scan(f"gather(blk16)+xv tb={tb}", mk)

# B: indexed multi-operand xv
for blk, G in ((16, 4), (16, 13), (16, 25), (32, 8), (128, 1)):
    def mk(blk=blk, G=G):
        n_steps = max(1, 800 // (G * blk))
        nbk = n_steps * G
        idxs = jnp.asarray(rng.integers(0, R // blk, size=(STEPS, nbk)),
                           jnp.int32)
        f = indexed_xv(blk, G, n_steps)

        def step(tiles_arg, idx_t, acc):
            return jnp.sum(f(idx_t, tiles_arg)) + acc * 1e-38
        return step, idxs
    timeit_scan(f"indexed xv blk={blk} G={G} (B={G*blk*max(1,800//(G*blk))})",
                mk)
