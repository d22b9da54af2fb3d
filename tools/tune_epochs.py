#!/usr/bin/env python
"""Experiment: per-epoch dispatch overhead; multi-epoch scan-in-one-jit.

bench.py measures ~44 ms/epoch at N=4096, B=800, 1M SNPs while the
in-scan step costs sum to ~37.5 ms (5 full steps x 7.0 + remainder ~2.5)
-- the ~6.5 ms gap is suspected host->tunnel dispatch latency per
epoch_fn call. A/B: the production per-epoch dispatch loop vs one jit
that lax.scans E epochs (per-epoch keys precomputed), same math.

Usage: python tools/tune_epochs.py  (TPU)

ADOPTED: the engine now groups each log period (and optionally several,
NA_TPU_EPOCH_GROUP_PERIODS) into one jit dispatch -- see
engine.make_epoch_fn(epochs_per_call=...) and PARITY.md's grouped-epoch
entry. This script remains the isolated A/B for the dispatch gap.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from neural_admixture_tpu.models import qp
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.train.engine import block_geometry, make_epoch_fn
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M = int(os.environ.get("PROF_M", 1_000_000))
N = 4096
B = 800
K = 8
BLK = 16
EPOCHS = 6
ITERS = 4
m_pad = ((M + 2047) // 2048) * 2048
rng = np.random.default_rng(0)

_, _, _, n_rows = block_geometry(N, B, True, None, BLK)
u32 = rng.integers(0, 2**32, size=(n_rows, m_pad // 16),
                   dtype=np.uint64).astype(np.uint32)
packed_dev = jax.device_put(np.ascontiguousarray(pk.tiles_from_rows(u32)))

V = rng.normal(size=(m_pad, 8)).astype(np.float32) * 0.01
P_init = rng.uniform(0.2, 0.8, size=(K, m_pad)).astype(np.float32)
params0 = qp.init_params(jax.random.PRNGKey(0), jnp.asarray(V),
                         jnp.asarray(P_init), 1024, [K])
tx = optax.adam(2e-3, b1=0.9, b2=0.95, eps=1e-8)
col_mask = jnp.ones((m_pad,), jnp.float32)
pops = jnp.zeros((N,), jnp.int32)

epoch_fn = make_epoch_fn(tx, N, B, supervised=False,
                         supervised_loss_weight=0.0, use_pallas=True,
                         compute_loss=False, params_template=params0,
                         sample_block=BLK, n_rows=n_rows, no_missing=True)


def sync(params):
    return float(jnp.sum(params["rmsnorm"]["weight"]))


def run_loop(params, opt_state, key):
    for _ in range(EPOCHS):
        key, ke = jax.random.split(key)
        params, opt_state, _ = epoch_fn(params, opt_state, packed_dev,
                                        col_mask, pops, ke)
    return params, opt_state


# Multi-epoch scan: one dispatch for EPOCHS epochs. Calling the jitted
# epoch_fn inside another jit inlines the traced computation.
@jax.jit
def run_scanned(params, opt_state, packed, col_mask, pops, keys):
    def body(carry, ke):
        p, o = carry
        p, o, _ = epoch_fn(p, o, packed, col_mask, pops, ke)
        return (p, o), None
    (params, opt_state), _ = jax.lax.scan(body, (params, opt_state), keys)
    return params, opt_state


params0 = jax.device_put(params0)


def fresh():
    # epoch_fn donates (params, opt_state); give every run its own copies.
    p = jax.tree.map(jnp.array, params0)
    return p, tx.init(p)


keys = jax.random.split(jax.random.PRNGKey(42), EPOCHS)


def timeit(name, fn, *args):
    p, o = fresh()
    out = fn(p, o, *args)
    sync(out[0])
    t0 = time.time()
    for _ in range(ITERS):
        p, o = fresh()
        out = fn(p, o, *args)
    sync(out[0])
    per = (time.time() - t0) / ITERS / EPOCHS
    print(f"{name:34s} {per*1e3:9.2f} ms/epoch", flush=True)


timeit("per-epoch dispatch (production)", run_loop, jax.random.PRNGKey(42))
timeit("scan 6 epochs in one jit", run_scanned, packed_dev, col_mask, pops,
       keys)
