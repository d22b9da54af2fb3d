#!/usr/bin/env python
"""Experiment: gather cost vs sample_block AFTER the transposed-V xv kernel.

The dynamic-slice block gather was tuned when xv cost ~2.9 ms in-scan;
the transposed-V operand cut xv to ~1.5 ms, so the gather is now a larger
share of the step. Re-sweep blk in-scan (gather+xv), plus two bounds:
a single contiguous 800-row slice (the no-shuffle floor) and no gather at
all (xv on a pre-staged batch).

Usage: python tools/tune_gather2.py  (TPU)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.ops.fused import pick_tb
from neural_admixture_tpu.ops.fused_step import _xv_call
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M = int(os.environ.get("PROF_M", 1_000_000))
N = 4096
B = 800
STEPS = 40
ITERS = 5
m_pad = ((M + 2047) // 2048) * 2048
rng = np.random.default_rng(0)
u32 = rng.integers(0, 2**32, size=(N, m_pad // 16),
                   dtype=np.uint64).astype(np.uint32)
tiles = jax.device_put(np.ascontiguousarray(pk.tiles_from_rows(u32)))
V = jax.device_put(rng.normal(size=(m_pad, 8)).astype(np.float32) * 0.01)


def xv(xb, v):
    return _xv_call(xb, v, pick_tb(xb.shape[1]), no_missing=True)


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(out.ravel()[:1]))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(out.ravel()[:1]))
    per = (time.time() - t0) / ITERS / STEPS
    print(f"{name:34s} {per*1e3:9.2f} ms/step", flush=True)


print(f"B={B} M={M} steps={STEPS}", flush=True)

# no gather: xv on a fixed staged batch
xb_fix = jnp.asarray(np.asarray(tiles)[:, :B])


@jax.jit
def scan_nogather(t, v):
    def body(acc, _):
        return acc + xv(xb_fix, v)[0, 0], None
    acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
    return acc


timeit("xv only (staged batch)", scan_nogather, tiles, V)

# contiguous: one dynamic slice of B rows per step
starts = jnp.asarray(rng.integers(0, N - B, size=(STEPS,), dtype=np.int32))


@jax.jit
def scan_contig(t, v):
    def body(acc, s):
        xb = jax.lax.dynamic_slice_in_dim(t, s, B, axis=1)
        return acc + xv(xb, v)[0, 0], None
    acc, _ = jax.lax.scan(body, jnp.float32(0), starts)
    return acc


timeit("contig slice + xv", scan_contig, tiles, V)

for blk in (16, 32, 64, 128):
    b_round = -(-B // blk) * blk
    nb = b_round // blk
    idx_steps = jnp.asarray(
        rng.integers(0, N // blk, size=(STEPS, nb), dtype=np.int32))

    @jax.jit
    def scan_blk(t, v, idx_steps=idx_steps, nb=nb, blk=blk):
        def body(acc, idx_b):
            xb = jnp.concatenate(
                [jax.lax.dynamic_slice_in_dim(t, idx_b[b] * blk, blk, axis=1)
                 for b in range(nb)], axis=1)
            return acc + xv(xb, v)[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), idx_steps)
        return acc

    timeit(f"dyn-slice blk={blk} (B={b_round}) + xv", scan_blk, tiles, V)
