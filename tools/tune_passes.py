#!/usr/bin/env python
"""Current per-pass in-scan costs of the fused step (post transposed-V).

Each leg scans one pass over a STAGED batch (no gather), so the numbers
are the pure kernel costs at production shapes. Compare with
tools/tune_adam.py (optimizer) and tools/tune_gather2.py (gather).

Usage: python tools/tune_passes.py  (TPU)
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
from neural_admixture_tpu.ops.fused import pick_tb
from neural_admixture_tpu.ops.fused_step import (_dq_dp_call, _dv_call,
                                                 _loss_call, _xv_call)
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M = int(os.environ.get("PROF_M", 1_000_000))
B = 800
K = 8
STEPS = 40
ITERS = 5
m_pad = ((M + 2047) // 2048) * 2048
rng = np.random.default_rng(0)
u32 = rng.integers(0, 2**32, size=(B, m_pad // 16),
                   dtype=np.uint64).astype(np.uint32)
xb = jax.device_put(np.ascontiguousarray(pk.tiles_from_rows(u32)))
tb = pick_tb(B)

V = jax.device_put(rng.normal(size=(m_pad, 8)).astype(np.float32) * 0.01)
q = jax.device_put(rng.uniform(0, 1, size=(B, K)).astype(np.float32))
P = jax.device_put(rng.uniform(0.2, 0.8, size=(K, m_pad)).astype(np.float32))
cm2 = jnp.ones((1, m_pad), jnp.float32)
rw2 = jnp.ones((B, 1), jnp.float32)
dXp = jax.device_put(rng.normal(size=(B, 8)).astype(np.float32))


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(out.ravel()[:1]))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(out.ravel()[:1]))
    per = (time.time() - t0) / ITERS / STEPS
    print(f"{name:30s} {per*1e3:9.2f} ms/step", flush=True)


def scan_of(fn):
    """fn(acc, *args) -> scalar. The acc MUST feed an operand of the
    kernel under test: a loop-invariant body is hoisted out of the scan by
    XLA (one kernel execution for the whole scan), which produced bogus
    sub-HBM-floor numbers in tune_gather2.py's staged leg."""
    @jax.jit
    def run(*args):
        def body(acc, _):
            return acc + fn(acc, *args), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
        return acc
    return run


print(f"B={B} M={M} steps={STEPS} no_missing=True unmasked", flush=True)
# acc*1e-38 perturbations keep every leg live without changing the math
# measurably; the V/dXp perturbation adds one 32MB/25KB elementwise pass.
timeit("xv", scan_of(lambda a, x, v: _xv_call(x, v + a * 1e-38, tb,
                                              True)[0, 0]), xb, V)
timeit("loss (masked, logged epochs)",
       scan_of(lambda a, qq, pp, x: _loss_call([qq + a * 1e-38], [pp], x,
                                               cm2, rw2, tb, True, True)),
       q, P, xb)
timeit("dq_dp (unmasked)",
       scan_of(lambda a, qq, pp, x: _dq_dp_call(
           [qq + a * 1e-38], [pp], x, cm2, rw2, jnp.float32(1), tb, True,
           False)[0][0][0, 0]), q, P, xb)
timeit("dv", scan_of(lambda a, x, d: _dv_call(x, d + a * 1e-38, tb,
                                              True)[0, 0]), xb, dXp)
