#!/usr/bin/env python
"""Measure the encoder's true in-scan cost (fwd, fwd+vjp) at step shapes.

The per-pass breakdown attributed ~1.4 ms/step to the tiny encoder
(800x8 -> 1024 -> 8 fwd + VJP, ~40 MFLOP): 1-2 orders above its FLOP/HBM
floor. This isolates it inside lax.scan (no dispatch pollution) to decide
whether a fused Pallas encoder is worth building.

Usage: python tools/tune_encoder.py  (TPU)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from neural_admixture_tpu.models import qp
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

B = int(os.environ.get("PROF_B", 800))
D = 8
H = int(os.environ.get("PROF_H", 1024))
K = int(os.environ.get("PROF_K", 8))
STEPS = 100
ITERS = 5

rng = np.random.default_rng(0)
enc = {
    "rmsnorm": {"weight": jnp.ones((D,), jnp.float32)},
    "common": {"kernel": jnp.asarray(rng.normal(size=(D, H)).astype(np.float32) * 0.1),
               "bias": jnp.zeros((H,), jnp.float32)},
    "heads": {f"k{K}": {"kernel": jnp.asarray(
        rng.normal(size=(H, K)).astype(np.float32) * 0.1),
        "bias": jnp.zeros((K,), jnp.float32)}},
}
Xp = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
dq = {f"k{K}": jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))}


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    per = (time.time() - t0) / ITERS / STEPS
    print(f"{name:34s} {per*1e3:9.3f} ms/step", flush=True)


@jax.jit
def scan_fwd(enc, xp):
    def body(c, _):
        qs = qp.encode_from_xp(enc, c)
        return c + 1e-9 * qs[f"k{K}"].sum(), None
    c, _ = jax.lax.scan(body, xp, None, length=STEPS)
    return c


@jax.jit
def scan_fwd_vjp(enc, xp, dq):
    def body(c, _):
        qs, vjp = jax.vjp(lambda e, x: qp.encode_from_xp(e, x), enc, c)
        de, dxp = vjp(dq)
        return c + 1e-9 * (dxp + de["common"]["bias"].sum()), None
    c, _ = jax.lax.scan(body, xp, None, length=STEPS)
    return c


@jax.jit
def scan_noop(xp):
    def body(c, _):
        return c * 1.0000001, None
    c, _ = jax.lax.scan(body, xp, None, length=STEPS)
    return c


print(f"B={B} D={D} H={H} K={K} steps/scan={STEPS}", flush=True)
timeit("scan noop (overhead floor)", scan_noop, Xp)
timeit("encoder fwd", scan_fwd, enc, Xp)
timeit("encoder fwd+vjp", scan_fwd_vjp, enc, Xp, dq)
