#!/usr/bin/env python
"""Isolated measurement: masked vs unmasked fused backward at bench shapes.

The unmasked variant (ops.fused_step ``masked=False``) drops the
col_mask/row_weight operands and their per-genotype multiplies from the
loss and dq_dp kernels; the engine uses it for full (all-real) batches
under the remainder-batch scheme. This script times jax.grad of the fused
op both ways on the real chip.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from neural_admixture_tpu.models import qp
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.ops.fused_step import make_fused_training_loss
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M = int(os.environ.get("NA_TUNE_M", 1_000_000))
B = int(os.environ.get("NA_TUNE_B", 800))
K = int(os.environ.get("NA_TUNE_K", 8))
ITERS = int(os.environ.get("NA_TUNE_ITERS", 20))
m_pad = ((M + 2047) // 2048) * 2048
rng = np.random.default_rng(0)
u32 = rng.integers(0, 2**32, size=(B, m_pad // 16),
                   dtype=np.uint64).astype(np.uint32)
xb = jax.device_put(np.ascontiguousarray(pk.tiles_from_rows(u32)))

V = rng.normal(size=(m_pad, 8)).astype(np.float32) * 0.01
P_init = rng.uniform(0.2, 0.8, size=(K, m_pad)).astype(np.float32)
params = qp.init_params(jax.random.PRNGKey(0), V[:, :8], P_init, 1024, [K])
cm = jnp.ones((m_pad,), jnp.float32)
rw = jnp.ones((B,), jnp.float32)


def timeit(name, fn, *args):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    print(f"{name:38s} {(time.time()-t0)/ITERS*1e3:9.2f} ms", flush=True)
    return out


for masked in (True, False):
    for no_missing in (False, True):
        op = make_fused_training_loss([f"k{K}"], no_missing=no_missing,
                                      masked=masked)

        def loss_fn(p, xb, op=op):
            enc = {k: p[k] for k in ("rmsnorm", "common", "heads")}
            loss, _ = op(p["V"], enc, p["decoders"], xb, cm, rw)
            return loss

        tag = f"masked={masked} no_missing={no_missing}"
        timeit(f"grad 3-pass [{tag}]", jax.jit(jax.grad(loss_fn)), params, xb)
        timeit(f"loss fwd   [{tag}]", jax.jit(loss_fn), params, xb)
