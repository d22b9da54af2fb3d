#!/usr/bin/env python
"""Poor-man's kernel profiler for the axon tunnel (no jax.profiler there).

Times each production fused-step pass (ops.fused_step) in isolation at
bench-like shapes and tile-major layout, chaining ITERS calls and syncing
with a scalar fetch. Usage: python tools/profile_kernels.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from neural_admixture_tpu.ops import fused_step as fs
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.ops.fused import pick_tb
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
u32_rows = packed.view("<u4")
tiles = jnp.asarray(np.ascontiguousarray(pk.tiles_from_rows(u32_rows)))
Q = jnp.asarray(rng.dirichlet(np.ones(K), size=B).astype(np.float32))
P = jnp.asarray(rng.uniform(0.2, 0.8, size=(K, m_pad)).astype(np.float32))
V = jnp.asarray(rng.normal(size=(m_pad, D)).astype(np.float32) * 0.01)
cm = jnp.ones((m_pad,), jnp.float32)
cm2 = cm.reshape(1, -1)
rw = jnp.ones((B,), jnp.float32)
rw2 = rw.reshape(-1, 1)
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

tb = pick_tb(B)

xv = jax.jit(lambda u, v: fs._xv_call(u, v, tb))
timeit("pass1 xv (unpack + X@V)", xv, tiles, V)

loss = jax.jit(lambda q, p, u: fs._loss_call([q], [p], u, cm2, rw2, tb))
timeit("passL loss fwd", loss, Q, P, tiles)

dqdp = jax.jit(lambda q, p, u, g: fs._dq_dp_call(
    [q], [p], u, cm2, rw2, g, tb))
timeit("pass2 dq+dp (merged)", dqdp, Q, P, tiles, jnp.float32(1.0))

dv = jax.jit(lambda u, dx: fs._dv_call(u, dx, tb))
timeit("pass3 dv", dv, tiles, dxp)

# the full production op (fwd + custom-VJP backward)
op = fs.make_fused_training_loss([f"k{K}"])
enc = {
    "rmsnorm": {"weight": jnp.ones((D,), jnp.float32)},
    "common": {"kernel": jnp.asarray(
        rng.normal(size=(D, 64)).astype(np.float32) * 0.1),
        "bias": jnp.zeros((64,), jnp.float32)},
    "heads": {f"k{K}": {"kernel": jnp.asarray(
        rng.normal(size=(64, K)).astype(np.float32) * 0.1),
        "bias": jnp.zeros((K,), jnp.float32)}},
}
full = jax.jit(jax.grad(
    lambda vps, u: op(vps[0], vps[1], {f"k{K}": vps[2]}, u, cm, rw)[0]))
timeit("full op grad (3 passes)", full, (V, enc, P), tiles)

# XLA reference path at the same shapes (planar row-major input)
u32_flat = jnp.asarray(u32_rows)
xla = jax.jit(lambda q, p, u: clamped_bce_sum(
    q @ p, unpack_dosage_x_planar(u), cm, rw))
timeit("xla bce fwd (unpack+mm)", xla, Q, P, u32_flat)
xla_g = jax.jit(jax.grad(lambda p, u: clamped_bce_sum(
    Q @ p, unpack_dosage_x_planar(u), cm, rw)))
timeit("xla bce grad dP", xla_g, P, u32_flat)
