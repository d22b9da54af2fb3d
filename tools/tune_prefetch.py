#!/usr/bin/env python
"""Experiment: can the batch gather overlap the fused compute passes?

Current engine: step t gathers its own batch (dynamic-slice blocks,
~1.6 ms) then runs the 3 fused passes -- strictly serial data dependence.
Prefetch variant: the scan carry holds the NEXT step's gathered batch, so
step t's gather (for t+1) has no consumer inside step t and XLA's static
scheduler is free to overlap its DMAs with the Pallas passes.

Usage: python tools/tune_prefetch.py  (TPU)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from neural_admixture_tpu.models import qp
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.ops.fused_step import make_fused_training_loss
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M = int(os.environ.get("PROF_M", 1_000_000))
N = 4096
B = 800
K = 8
BLK = 16
STEPS = 40
ITERS = 5
m_pad = ((M + 2047) // 2048) * 2048
rng = np.random.default_rng(0)
u32 = rng.integers(0, 2**32, size=(N, m_pad // 16),
                   dtype=np.uint64).astype(np.uint32)
tiles = jax.device_put(np.ascontiguousarray(pk.tiles_from_rows(u32)))

V = rng.normal(size=(m_pad, 8)).astype(np.float32) * 0.01
P_init = rng.uniform(0.2, 0.8, size=(K, m_pad)).astype(np.float32)
params = qp.init_params(jax.random.PRNGKey(0), V[:, :8], P_init, 1024, [K])
tx = optax.adam(2e-3, b1=0.9, b2=0.95, eps=1e-8)
opt_state = tx.init(params)
cm = jnp.ones((m_pad,), jnp.float32)
rw = jnp.ones((B,), jnp.float32)
op = make_fused_training_loss([f"k{K}"])

nb = B // BLK
idx_steps = jnp.asarray(
    rng.integers(0, N // BLK, size=(STEPS, nb), dtype=np.int32))


def gather(t, idx_b):
    return jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(t, idx_b[b] * BLK, BLK, axis=1)
         for b in range(nb)], axis=1)


def loss_fn(p, xb):
    enc = {k: p[k] for k in ("rmsnorm", "common", "heads")}
    return op(p["V"], enc, p["decoders"], xb, cm, rw)[0]


def compute(p, s, xb):
    g = jax.grad(loss_fn)(p, xb)
    upd, s = tx.update(g, s, p)
    p = optax.apply_updates(p, upd)
    return qp.restrict_P(p), s


@jax.jit
def scan_serial(p, s, t):
    def body(carry, idx_b):
        p, s = carry
        xb = gather(t, idx_b)
        p, s = compute(p, s, xb)
        return (p, s), None
    (p, s), _ = jax.lax.scan(body, (p, s), idx_steps)
    return p


@jax.jit
def scan_prefetch(p, s, t):
    xb0 = gather(t, idx_steps[0])

    def body(carry, idx_next):
        p, s, xb = carry
        xb_next = gather(t, idx_next)     # no consumer this step
        p, s = compute(p, s, xb)
        return (p, s, xb_next), None
    (p, s, _), _ = jax.lax.scan(body, (p, s, xb0), idx_steps)
    return p


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    per = (time.time() - t0) / ITERS / STEPS
    print(f"{name:30s} {per*1e3:9.2f} ms/step", flush=True)


print(f"B={B} M={M} blk={BLK} steps={STEPS}", flush=True)
timeit("serial gather+step", scan_serial, params, opt_state, tiles)
timeit("prefetch-in-carry", scan_prefetch, params, opt_state, tiles)
