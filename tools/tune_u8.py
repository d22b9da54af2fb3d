#!/usr/bin/env python
"""Does the in-kernel 2-bit unpack cost anything vs a uint8-resident X?

The dq_dp draw chain is the single-chip wall (~3.6 ms of a ~7 ms step,
PARITY.md). Its VPU budget includes ~4 unpack ops/genotype (shift, mask,
convert, scale). A uint8-resident genotype matrix would remove the
shift+mask at the price of 4x the HBM reads per pass (1 B/genotype instead
of 0.25) and 4x the resident capacity. This script answers whether that
trade wins on v5e before anyone builds a production path for it:

  A. production kernel: packed u32 tiles, in-VMEM unpack (replica of
     ops.fused_step._dq_dp_kernel, unmasked, 1 head);
  B. same kernel, X supplied as a (B, M) uint8 resident -- unpack replaced
     by convert+scale;
  C. same, X supplied as f32 (16x packed bytes -- the reference's traffic).

Also the unpack+sum micro-floors for each representation.

MEASURED (v5e via axon tunnel, 2026-08-20, B=800 x 1M, K=8, tb=400,
ITERS=10, isolated dispatch -- same methodology both sides so dispatch
pollution cancels):

  dq_dp  A packed u32 + unpack   9.81 ms
         B uint8 resident        13.64 ms   (+39% -- LOSES)
         C f32 resident          23.19 ms   (2.4x -- the reference's cost)
  unpack+sum floor: u32 3.80 ms / u8 8.46 ms / f32 16.08 ms

CONCLUSION: the 2-bit unpack is FREE on v5e -- the dq_dp pass is bound by
HBM+VPU together such that quartering the bytes pays for the shift/mask
ops several times over. uint8 residency loses even before its 4x capacity
cost; f32 residency shows why the reference's eager-torch step can't
compete. The packed design stands; no NA_TPU_RESIDENT_U8 path is
warranted.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_admixture_tpu.ops.fused import TM, TW
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.io.packed import pack_2bit_rows
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M_PAD = 1001472
B = 800
K = 8
TB = 400
NT = M_PAD // TM
NB = B // TB
ITERS = 10

rng = np.random.default_rng(0)
codes = rng.integers(0, 3, size=(B, M_PAD), dtype=np.uint8)
packed = pack_2bit_rows(codes, m_pad=M_PAD)
tiles = jax.device_put(np.ascontiguousarray(
    pk.tiles_from_rows(pk.packed_view_u32(packed))))
X_u8 = jax.device_put(codes)                       # (B, M_PAD) uint8
X_f32 = jax.device_put((codes * 0.5).astype(np.float32))
Q = jnp.asarray(rng.dirichlet(np.ones(K), size=B).astype(np.float32))
P = jnp.asarray(rng.uniform(0.05, 0.95, size=(K, M_PAD)).astype(np.float32))


def sync(*outs):
    s = 0.0
    for o in outs:
        s += float(jnp.sum(o.astype(jnp.float32)))
    return s


def timeit(name, fn, *args):
    try:
        outs = fn(*args)
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return None
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    sync(*outs)
    t0 = time.time()
    for _ in range(ITERS):
        outs = fn(*args)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
    sync(*outs)
    print(f"{name:34s} {(time.time()-t0)/ITERS*1e3:8.2f} ms", flush=True)
    return outs


def unpack_u32(u):
    parts = [((u >> jnp.uint32(2 * b)) & jnp.uint32(3)) for b in range(16)]
    g = jnp.concatenate(parts, axis=-1).astype(jnp.int32)
    return g.astype(jnp.float32) * jnp.float32(0.5)


# x_mode: "packed" (u32 tiles + unpack), "u8" (convert+scale), "f32" (load)
def mk_dq_dp(x_mode):
    def kernel(q_ref, p_ref, u_ref, dq_ref, dp_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)
        if x_mode == "packed":
            x = unpack_u32(u_ref[0])
        elif x_mode == "u8":
            x = u_ref[:].astype(jnp.float32) * jnp.float32(0.5)
        else:
            x = u_ref[:]
        q = q_ref[:]
        p = p_ref[:]
        raw = jnp.dot(q, p, preferred_element_type=jnp.float32)
        rec = jnp.clip(raw, 0.0, 1.0)
        denom = jnp.maximum(rec * (1.0 - rec), 1e-12)
        drec = (rec - x) * pl.reciprocal(denom, approx=True)
        draw = jnp.where(raw == rec, drec, 0.0)
        dqt_blk = jax.lax.dot_general(
            p, draw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            dq_ref[i] = dqt_blk

        @pl.when(j > 0)
        def _():
            dq_ref[i] += dqt_blk

        @pl.when(i == 0)
        def _():
            dp_ref[:] = jnp.zeros_like(dp_ref)
        dp_ref[:] += jax.lax.dot_general(
            q, draw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if x_mode == "packed":
        x_spec = pl.BlockSpec((1, TB, TW), lambda j, i: (j, i, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((TB, TM), lambda j, i: (i, j),
                              memory_space=pltpu.VMEM)
    return jax.jit(lambda q, p, t: pl.pallas_call(
        kernel,
        grid=(NT, NB),
        in_specs=[
            pl.BlockSpec((TB, K), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TM), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=[
            pl.BlockSpec((NB, K, TB), lambda j, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TM), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, K, TB), jnp.float32),
            jax.ShapeDtypeStruct((K, M_PAD), jnp.float32),
        ],
    )(q, p, t))


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float((np.abs(a - b) / (np.abs(b) + 1e-6)).max())


print(f"== dq_dp by X representation (B={B}, M_PAD={M_PAD}, K={K}, "
      f"tb={TB}) ==", flush=True)
ref = timeit("A packed u32 + in-VMEM unpack", mk_dq_dp("packed"), Q, P, tiles)
for name, mode, arg in [("B uint8 resident (no unpack)", "u8", X_u8),
                        ("C f32 resident (reference traffic)", "f32", X_f32)]:
    outs = timeit(name, mk_dq_dp(mode), Q, P, arg)
    if outs is not None and ref is not None:
        print(f"    dq rel err {rel_err(outs[0], ref[0]):.3e}; "
              f"dp rel err {rel_err(outs[1], ref[1]):.3e}", flush=True)


def mk_sum(x_mode):
    def kernel(u_ref, out_ref):
        @pl.when(jnp.logical_and(pl.program_id(0) == 0,
                                 pl.program_id(1) == 0))
        def _():
            out_ref[0, 0] = 0.0
        if x_mode == "packed":
            x = unpack_u32(u_ref[0])
        elif x_mode == "u8":
            x = u_ref[:].astype(jnp.float32) * jnp.float32(0.5)
        else:
            x = u_ref[:]
        out_ref[0, 0] += jnp.sum(x)

    if x_mode == "packed":
        x_spec = pl.BlockSpec((1, TB, TW), lambda i, j: (j, i, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((TB, TM), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
    return jax.jit(lambda t: pl.pallas_call(
        kernel,
        grid=(NB, NT),
        in_specs=[x_spec],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(t))


print("== x + sum micro-floor by representation ==", flush=True)
timeit("packed u32 unpack -> sum", mk_sum("packed"), tiles)
timeit("uint8 convert -> sum", mk_sum("u8"), X_u8)
timeit("f32 load -> sum", mk_sum("f32"), X_f32)
