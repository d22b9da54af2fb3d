#!/usr/bin/env python
"""Minimal repro: bf16 vector COMPARISONS crash the Mosaic remote compiler.

Round-4 isolation of round 3's "full bf16 draw-chain kernels fail Mosaic
remote compilation (HTTP 500)" (PARITY.md round-3/4 notes). Binary search
over single-op Pallas kernels pins the failing construct exactly:

    measured on v5e via the axon tunnel, 2026-08-20:
      f32 passthrough                OK      bf16 add / mul / clip      OK
      bf16 cast roundtrip            OK      bf16 maximum / reciprocal  OK
      where(f32 cond, bf16, bf16)    OK      select_n(bool, bf16, bf16) OK
      where(bf16 == bf16, ...)       HTTP 500 (tpu_compile_helper exit 1)
      where(bf16 >  bf16, ...)       HTTP 500
      bf16 eq -> f32 where           HTTP 500

i.e. any COMPARISON whose operands are bf16 vectors crashes the
tpu_compile_helper subprocess (a compiler bug -- exit code 1, not a
diagnostic); every other bf16 construct the draw chain needs compiles.
Workaround used by tools/tune_bf16.py (cmp_f32 variants): compute the
boundary mask from the f32 dot output (`raw == clip(raw, 0, 1)`) and
select bf16 values under it -- which let the full bf16 chain compile and
measure (SLOWER than f32; see PARITY.md round-4 notes).

Run on the TPU to re-check after a toolchain update; every line should
print OK once the compiler bug is fixed.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

bf16 = jnp.bfloat16
X = jnp.asarray(np.random.default_rng(0).normal(size=(256, 512))
                .astype(np.float32))


def run(name, body):
    def kern(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((256, 512), jnp.float32))(X)
        print(f"{name:44s} OK  {float(jnp.sum(out)):.3f}", flush=True)
    except Exception as e:  # noqa: BLE001 - the point is to classify failures
        print(f"{name:44s} FAIL {str(e).splitlines()[0][:100]}", flush=True)


run("f32 passthrough", lambda x: x)
run("bf16 cast roundtrip", lambda x: x.astype(bf16).astype(jnp.float32))
run("bf16 add", lambda x: (x.astype(bf16) + bf16(1.0)).astype(jnp.float32))
run("bf16 clip", lambda x: jnp.clip(x.astype(bf16), bf16(0.0),
                                    bf16(1.0)).astype(jnp.float32))
run("bf16 maximum", lambda x: jnp.maximum(x.astype(bf16),
                                          bf16(0.0)).astype(jnp.float32))
run("where(f32 cond, bf16, bf16)",
    lambda x: jnp.where(x > 0.0, x.astype(bf16), bf16(0.0))
    .astype(jnp.float32))
run("select_n(bool, bf16, bf16)",
    lambda x: jax.lax.select_n(x > 0, bf16(0.0) * x.astype(bf16),
                               x.astype(bf16)).astype(jnp.float32))
# --- the three failing constructs (bf16-operand comparisons) ---
run("where(bf16 eq bf16, bf16, bf16)  [BUG]",
    lambda x: jnp.where(x.astype(bf16) == bf16(0.0), bf16(0.0),
                        x.astype(bf16)).astype(jnp.float32))
run("where(bf16 gt bf16, bf16, bf16)  [BUG]",
    lambda x: jnp.where(x.astype(bf16) > bf16(0.0), x.astype(bf16),
                        bf16(0.0)).astype(jnp.float32))
run("bf16 eq -> f32 where             [BUG]",
    lambda x: jnp.where(x.astype(bf16) == x.astype(bf16), 1.0, 0.0))
