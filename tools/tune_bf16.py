#!/usr/bin/env python
"""Round-3 perf experiment: lower-precision levers on the dq_dp hot kernel.

VERDICT.md round 2 item 1: the dq_dp draw chain (~15 VPU ops/genotype incl
unpack) is ~52% of the step and sits near the f32 VPU arithmetic floor.
Levers measured here, on a faithful replica of the production unmasked
single-head dq_dp kernel (grid (nM, nB), resident dq, accumulated dp):

  A. dot operand precision: the kernel's three MXU contractions (raw = q@p,
     dqt = p@draw^T, dp += q^T draw) with f32 operands lower to multi-pass
     MXU sequences; casting operands to bf16 (q/p tiny per tile; draw is
     (tb, TM)) makes them native single-pass.
  B. elementwise chain precision: the clip/denom/recip/select chain in bf16
     (2 packed per 32-bit lane) instead of f32.
  C. unpack micro-floor: current u32 16x(shift+and) extraction vs int16
     bitcast extraction density, and cast-to-bf16 variants.

Accuracy columns: max/mean rel err of dq and dp vs the f32 production math
(which itself uses the approx reciprocal -- the production default).
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
# no-missing genotypes, as the bench workload (codes 0..2 only)
codes = rng.integers(0, 3, size=(B, M_PAD), dtype=np.uint8)
packed = pack_2bit_rows(codes, m_pad=M_PAD)
u32 = pk.packed_view_u32(packed)
tiles = jax.device_put(np.ascontiguousarray(pk.tiles_from_rows(u32)))
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
    except Exception as e:  # noqa: BLE001 - report per-variant failures
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


def unpack_u32(u, out_dtype=jnp.float32, scale=True):
    parts = [((u >> jnp.uint32(2 * b)) & jnp.uint32(3)) for b in range(16)]
    g = jnp.concatenate(parts, axis=-1).astype(jnp.int32)
    x = g.astype(out_dtype)
    if scale:
        x = x * out_dtype(0.5)
    return x


def unpack_u16(u, out_dtype=jnp.float32, scale=True):
    """Extract at int16 lane density (2 packed per 32-bit lane)."""
    u16 = pltpu.bitcast(u, jnp.uint16)  # (tb, 2*TW)
    parts = [((u16 >> jnp.uint16(2 * b)) & jnp.uint16(3)) for b in range(8)]
    g = jnp.concatenate(parts, axis=-1).astype(jnp.int32)  # (tb, TM)
    x = g.astype(out_dtype)
    if scale:
        x = x * out_dtype(0.5)
    return x


# --------------------------- dq_dp variants --------------------------------


def mk_dq_dp(x_dtype, chain_dtype, dot_dtype, unpack=unpack_u32,
             cmp_f32=False):
    """Replica of ops.fused_step._dq_dp_kernel (unmasked, 1 head, g=1).

    ``cmp_f32``: compute the boundary mask from the f32 ``raw`` instead of
    comparing chain-dtype values -- the round-4 isolation (tools logs,
    PARITY.md) pinned the Mosaic remote-compile HTTP 500 to COMPARISONS on
    bf16 vectors specifically (bf16 arithmetic, clip, min/max, and selects
    under an f32-derived mask all compile); this flag routes around the
    compiler crash so the full-bf16 chain finally gets a measured number.
    """
    def kernel(q_ref, p_ref, u_ref, dq_ref, dp_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)
        x = unpack(u_ref[0], x_dtype)
        q = q_ref[:]
        p = p_ref[:]
        qd = q.astype(dot_dtype)
        pd = p.astype(dot_dtype)
        raw = jnp.dot(qd, pd, preferred_element_type=jnp.float32)
        rawc = raw.astype(chain_dtype)
        xc = x.astype(chain_dtype)
        rec = jnp.clip(rawc, chain_dtype(0.0), chain_dtype(1.0))
        denom = jnp.maximum(rec * (chain_dtype(1.0) - rec),
                            chain_dtype(1e-12))
        if chain_dtype == jnp.float32:
            drec = (rec - xc) * pl.reciprocal(denom, approx=True)
        else:
            drec = (rec - xc) / denom
        if cmp_f32:
            inside = raw == jnp.clip(raw, 0.0, 1.0)
            draw = jnp.where(inside, drec, chain_dtype(0.0))
        else:
            draw = jnp.where(rawc == rec, drec, chain_dtype(0.0))
        drawd = draw.astype(dot_dtype)
        dqt_blk = jax.lax.dot_general(
            pd, drawd, (((1,), (1,)), ((), ())),
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
            qd, drawd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return jax.jit(lambda q, p, t: pl.pallas_call(
        kernel,
        grid=(NT, NB),
        in_specs=[
            pl.BlockSpec((TB, K), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TM), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, TW), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),
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
    d = np.abs(a - b) / (np.abs(b) + 1e-6)
    return float(d.max()), float(d.mean())


print(f"== dq_dp variants (B={B}, M_PAD={M_PAD}, K={K}, tb={TB}) ==",
      flush=True)
f32 = jnp.float32
bf16 = jnp.bfloat16
ref = timeit("f32 prod (chain f32, dots f32)",
             mk_dq_dp(f32, f32, f32), Q, P, tiles)
variants = [
    ("dots bf16, chain f32", mk_dq_dp(f32, f32, bf16)),
    ("dots f32, chain bf16", mk_dq_dp(f32, bf16, f32)),
    ("all bf16 (x f32 unpack)", mk_dq_dp(f32, bf16, bf16)),
    ("all bf16 (x bf16 unpack)", mk_dq_dp(bf16, bf16, bf16)),
    ("chain bf16, f32 cmp", mk_dq_dp(f32, bf16, f32, cmp_f32=True)),
    ("all bf16, f32 cmp (x f32)", mk_dq_dp(f32, bf16, bf16, cmp_f32=True)),
    ("all bf16, f32 cmp (x bf16)", mk_dq_dp(bf16, bf16, bf16, cmp_f32=True)),
    ("u16 unpack, f32 math", mk_dq_dp(f32, f32, f32, unpack_u16)),
    ("u16 unpack, all bf16", mk_dq_dp(bf16, bf16, bf16, unpack_u16)),
]
for name, fn in variants:
    outs = timeit(name, fn, Q, P, tiles)
    if outs is not None and ref is not None:
        mq, aq = rel_err(outs[0], ref[0])
        mp_, ap = rel_err(outs[1], ref[1])
        print(f"    dq rel err max {mq:.3e} mean {aq:.3e}; "
              f"dp rel err max {mp_:.3e} mean {ap:.3e}", flush=True)


# --------------------------- unpack micro-floor ----------------------------


def mk_unpack_only(unpack, dtype):
    def kernel(u_ref, out_ref):
        @pl.when(jnp.logical_and(pl.program_id(0) == 0,
                                 pl.program_id(1) == 0))
        def _():
            out_ref[0, 0] = 0.0
        x = unpack(u_ref[0], dtype)
        out_ref[0, 0] += jnp.sum(x).astype(jnp.float32)

    return jax.jit(lambda t: pl.pallas_call(
        kernel,
        grid=(NB, NT),
        in_specs=[pl.BlockSpec((1, TB, TW), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(t))


print("== unpack+sum micro-floor ==", flush=True)
u_ref_out = timeit("u32 unpack -> f32 sum", mk_unpack_only(unpack_u32, f32),
                   tiles)
for name, up, dt in [
    ("u32 unpack -> bf16 sum", unpack_u32, bf16),
    ("u16 unpack -> f32 sum", unpack_u16, f32),
    ("u16 unpack -> bf16 sum", unpack_u16, bf16),
]:
    out = timeit(name, mk_unpack_only(up, dt), tiles)
    if out is not None and u_ref_out is not None:
        print(f"    sum rel err "
              f"{abs(float(out[0][0,0]) - float(u_ref_out[0][0,0])) / abs(float(u_ref_out[0][0,0])):.3e}",
              flush=True)
