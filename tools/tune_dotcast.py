#!/usr/bin/env python
"""Validate + time the bf16-dot-operand cast on the PRODUCTION fused step.

Claims to verify on real TPU at the bench workload (800 x 1M, K=8):
  1. NA_TPU_DOT_BF16=1 (production default on TPU) computes BIT-IDENTICAL
     loss and gradients to NA_TPU_DOT_BF16=0 -- the MXU reads f32 dot
     operands at bf16 precision by default, so the explicit cast changes
     no math, only operand traffic.
  2. The in-scan step time (MEASURED 2026-08-19: no end-to-end change --
     9.58 ms f32 vs 9.83 ms bf16 operands, within tunnel variance, and
     loss bit-identical. The -30% seen on the isolated dq_dp call in
     tools/tune_bf16.py does not transfer to the in-scan program; the
     cast is kept because it is free, bit-identical, and halves operand
     VMEM traffic, but the dq_dp wall is the VPU chain, not the MXU.)

In-scan timing: the scan body must be carry-dependent or XLA hoists it
(CLAUDE.md hazard); params are advanced by a tiny grad step each iter.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from neural_admixture_tpu.io.packed import pack_2bit_rows
from neural_admixture_tpu.models import qp
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M_PAD = 1001472
B = 800
K = 8
D = 8
H = 1024
STEPS = 20

rng = np.random.default_rng(0)
codes = rng.integers(0, 3, size=(B, M_PAD), dtype=np.uint8)
packed = pack_2bit_rows(codes, m_pad=M_PAD)
tiles = jax.device_put(np.ascontiguousarray(
    pk.tiles_from_rows(pk.packed_view_u32(packed))))
V0 = rng.normal(size=(M_PAD, D)).astype(np.float32) * 0.01
P0 = rng.uniform(0.1, 0.9, size=(K, M_PAD)).astype(np.float32)
params = qp.init_params(jax.random.PRNGKey(0), V0, P0, H, [K],
                        m_pad=M_PAD)
params = jax.tree.map(jnp.asarray, params)
cm = jnp.ones((M_PAD,), jnp.float32)
rw = jnp.ones((B,), jnp.float32)


def build(flag):
    os.environ["NA_TPU_DOT_BF16"] = flag
    from neural_admixture_tpu.ops.fused_step import make_fused_training_loss
    op = make_fused_training_loss(["k8"], no_missing=True, masked=False)

    def loss_fn(p):
        enc = {k: p[k] for k in ("rmsnorm", "common", "heads")}
        loss, _ = op(p["V"], enc, p["decoders"], tiles, cm, rw)
        return loss

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    @jax.jit
    def scan_steps(p):
        def body(p, _):
            loss, g = jax.value_and_grad(loss_fn)(p)
            p = jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
            return p, loss
        p, losses = jax.lax.scan(body, p, None, length=STEPS)
        return p, losses

    return grad_fn, scan_steps


results = {}
for flag in ("0", "1"):
    grad_fn, scan_steps = build(flag)
    loss, grads = grad_fn(params)
    loss = float(loss)
    # warm + time the scan (value fetch = the only real barrier on axon)
    p_out, losses = scan_steps(params)
    float(jnp.sum(p_out["V"]))
    t0 = time.time()
    p_out, losses = scan_steps(params)
    float(jnp.sum(p_out["V"]))
    dt = (time.time() - t0) / STEPS
    results[flag] = (loss, grads, dt)
    print(f"NA_TPU_DOT_BF16={flag}: loss {loss:.6f}  "
          f"step {dt * 1e3:8.3f} ms  ({B / dt:,.0f} samples/s)", flush=True)

l0, g0, _ = results["0"]
l1, g1, _ = results["1"]
print("loss bit-identical:", l0 == l1)
leaves0 = jax.tree_util.tree_leaves_with_path(g0)
leaves1 = jax.tree_util.tree_leaves(g1)
worst = 0.0
for (path, a), b in zip(leaves0, leaves1):
    a, b = np.asarray(a), np.asarray(b)
    ident = np.array_equal(a, b)
    rel = 0.0 if ident else float(
        np.max(np.abs(a - b) / (np.abs(a) + 1e-12)))
    worst = max(worst, rel)
    print(f"  {jax.tree_util.keystr(path):40s} bitwise={ident} "
          f"max_rel={rel:.3e}")
print("worst grad rel diff:", worst)
