#!/usr/bin/env python
"""Poor-man's kernel profiler for the axon tunnel (no jax.profiler there).

Times each hot kernel in isolation at bench-like shapes, chaining ITERS
calls and syncing with a scalar fetch; reports per-call ms after subtracting
the measured dispatch round-trip. Usage: python tools/profile_kernels.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from neural_admixture_tpu.ops import fused
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.ops.loss import clamped_bce_sum
from neural_admixture_tpu.ops.pack import unpack_dosage_x_planar
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M = int(os.environ.get("PROF_M", 1_000_000))
B = int(os.environ.get("PROF_B", 800))
K = int(os.environ.get("PROF_K", 8))
D = 8
ITERS = int(os.environ.get("PROF_ITERS", 10))

m_pad = ((M + 2047) // 2048) * 2048
rng = np.random.default_rng(0)
packed = rng.integers(0, 256, size=(B, m_pad // 4), dtype=np.uint8)
u32 = jnp.asarray(packed.view("<u4"))
Q = jnp.asarray(rng.dirichlet(np.ones(K), size=B).astype(np.float32))
P = jnp.asarray(rng.uniform(0.2, 0.8, size=(K, m_pad)).astype(np.float32))
V = jnp.asarray(rng.normal(size=(m_pad, D)).astype(np.float32) * 0.01)
cm = jnp.ones((m_pad,), jnp.float32)
rw = jnp.ones((B,), jnp.float32)
dxp = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))


def timeit(name, fn, *args):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:9.2f} ms/call", flush=True)
    return dt


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf).ravel()[0] if leaf.ndim else leaf)


@jax.jit
def rtt_probe(x):
    return x + 1.0


print(f"shapes: B={B} M={M} m_pad={m_pad} K={K} iters={ITERS}", flush=True)
t = timeit("dispatch RTT (x+1)", rtt_probe, jnp.float32(1.0))

tb = fused.pick_tb(B)

fwd = jax.jit(lambda q, p, u: fused._fwd_call(q, p, u, cm, rw, tb))
timeit("pallas bce fwd", fwd, Q, P, u32)

bwd = jax.jit(lambda q, p, u: fused._bwd_call(q, p, u, cm, rw,
                                              jnp.float32(1.0), tb))
timeit("pallas bce bwd (dq+dp)", bwd, Q, P, u32)

xv = jax.jit(fused.packed_xv)
timeit("pallas xv fwd", xv, u32, V)

fullgrad = jax.jit(jax.grad(
    lambda p_and_v, u: fused.fused_clamped_bce_sum(
        Q, p_and_v[0], u, cm, rw)
    + jnp.sum(fused.packed_xv(u, p_and_v[1]) * dxp)))
timeit("pallas full (fwd+bwd+xv+dv)", fullgrad, (P, V), u32)

# XLA reference path at the same shapes
xla = jax.jit(lambda q, p, u: clamped_bce_sum(
    q @ p, unpack_dosage_x_planar(u), cm, rw))
timeit("xla bce fwd (unpack+mm)", xla, Q, P, u32)
xla_g = jax.jit(jax.grad(lambda p, u: clamped_bce_sum(
    Q @ p, unpack_dosage_x_planar(u), cm, rw)))
timeit("xla bce grad dP", xla_g, P, u32)
