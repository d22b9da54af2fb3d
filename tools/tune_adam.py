#!/usr/bin/env python
"""Experiment: what do Adam + restrict_P actually cost IN-SCAN?

Isolated-dispatch timings (tools/profile_step.py) show adam 3.4 ms and
restrict_P 3.0 ms -- but isolated dispatch polluted the encoder number
before (tools/tune_encoder.py found 1.4 ms isolated vs 0.065 ms in-scan),
so measure the optimizer the same way: A/B legs of the production scan
with the optimizer pieces removed one at a time.

Traffic floor for Adam over P+V (two 32 MB leaves): read g+m+v+p
(256 MB) + write p+m+v (192 MB) = 448 MB ~= 0.55 ms at v5e's 819 GB/s.

Usage: python tools/tune_adam.py  (TPU)
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
op = make_fused_training_loss([f"k{K}"], masked=False)

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


def make_scan(use_adam=True, use_clamp=True, grad_only=False,
              adam_only=False):
    @jax.jit
    def run(p, s, t):
        def body(carry, idx_b):
            p, s, acc = carry
            if adam_only:
                g = jax.tree.map(lambda x: x * 1e-6, p)
            else:
                xb = gather(t, idx_b)
                g = jax.grad(loss_fn)(p, xb)
            if grad_only:
                # consume one element of every leaf so no pallas_call or
                # VJP output is droppable; params stay fixed.
                acc = acc + sum(l.ravel()[0] for l in jax.tree.leaves(g))
                return (p, s, acc), None
            if use_adam:
                upd, s = tx.update(g, s, p)
                p = optax.apply_updates(p, upd)
            else:
                p = jax.tree.map(lambda x, d: x - 1e-9 * d, p, g)
            if use_clamp:
                p = qp.restrict_P(p)
            return (p, s, acc), None
        (p, s, acc), _ = jax.lax.scan(body, (p, s, jnp.float32(0)),
                                      idx_steps)
        return p, acc
    return run


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    per = (time.time() - t0) / ITERS / STEPS
    print(f"{name:34s} {per*1e3:9.2f} ms/step", flush=True)


print(f"B={B} M={M} blk={BLK} steps={STEPS}", flush=True)
timeit("full (gather+grad+adam+clamp)", make_scan(), params, opt_state,
       tiles)
timeit("no clamp", make_scan(use_clamp=False), params, opt_state, tiles)
timeit("sgd update (no moments, no clamp)",
       make_scan(use_adam=False, use_clamp=False), params, opt_state, tiles)
timeit("grad only", make_scan(grad_only=True), params, opt_state, tiles)
timeit("adam+clamp only (fake grad)", make_scan(adam_only=True), params,
       opt_state, tiles)
