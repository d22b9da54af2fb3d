#!/usr/bin/env python
"""Does raising the Mosaic scoped-VMEM budget unlock wider batch tiles?

The heavy dq_dp kernel fails to compile at tb=800 against the default 16M
scoped-vmem limit (21.49M needed, bench_tb800 probe). v5e has 128M of
physical VMEM; pltpu.CompilerParams(vmem_limit_bytes=...) raises the
budget. Wider tiles halve the ~0.45us/grid-step fixed cost and give the
MXU longer contractions -- IF the reduced double-buffering headroom does
not stall the DMA pipeline. Measured on the production-shaped dq_dp
replica (unmasked, single head K=8) at tb 400 (default limit) vs tb
400/800 with a 64M budget.
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

from neural_admixture_tpu.io.packed import pack_2bit_rows
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.ops.fused import TM, TW, _draw_tile, _dot_in
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()
os.environ["NA_TPU_DOT_BF16"] = "1"

M_PAD = 1001472
B = 800
K = 8
NT = M_PAD // TM
ITERS = 10

rng = np.random.default_rng(0)
codes = rng.integers(0, 3, size=(B, M_PAD), dtype=np.uint8)
packed = pack_2bit_rows(codes, m_pad=M_PAD)
tiles = jax.device_put(np.ascontiguousarray(
    pk.tiles_from_rows(pk.packed_view_u32(packed))))
Q = jnp.asarray(rng.dirichlet(np.ones(K), size=B).astype(np.float32))
P = jnp.asarray(rng.uniform(0.05, 0.95, size=(K, M_PAD)).astype(np.float32))


def mk(tb, vmem_mb=None):
    from neural_admixture_tpu.ops.fused import _unpack_x

    nB = B // tb

    def kernel(q_ref, p_ref, u_ref, dq_ref, dp_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)
        x = _unpack_x(u_ref[0], True)
        q = q_ref[:]
        draw = _dot_in(_draw_tile(q, p_ref[:], x, None))
        dqt_blk = jax.lax.dot_general(
            _dot_in(p_ref[:]), draw, (((1,), (1,)), ((), ())),
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
            _dot_in(q), draw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    kwargs = {}
    if vmem_mb:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    return jax.jit(lambda q, p, t: pl.pallas_call(
        kernel,
        grid=(NT, nB),
        in_specs=[
            pl.BlockSpec((tb, K), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TM), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, TW), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nB, K, tb), lambda j, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TM), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nB, K, tb), jnp.float32),
            jax.ShapeDtypeStruct((K, M_PAD), jnp.float32),
        ],
        **kwargs,
    )(q, p, t))


def timeit(name, fn):
    try:
        outs = fn(Q, P, tiles)
    except Exception as e:  # noqa: BLE001
        print(f"{name:32s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    s = sum(float(jnp.sum(o)) for o in outs)
    t0 = time.time()
    for _ in range(ITERS):
        outs = fn(Q, P, tiles)
    sum(float(jnp.sum(o)) for o in outs)
    print(f"{name:32s} {(time.time()-t0)/ITERS*1e3:8.2f} ms  (sum {s:.3e})",
          flush=True)
    return outs


ref = timeit("tb=400, default vmem", mk(400))
for tb, mb in [(400, 64), (800, 64), (800, 100), (1600, 100)]:
    if B % tb:
        continue
    out = timeit(f"tb={tb}, vmem={mb}M", mk(tb, mb))
    if out is not None and ref is not None:
        d = max(float(np.max(np.abs(np.asarray(o).ravel()[:100000]
                                    - np.asarray(r).ravel()[:100000])))
                for o, r in [(out[1], ref[1])])
        print(f"    dp abs diff (sample): {d:.3e}", flush=True)
