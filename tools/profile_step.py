#!/usr/bin/env python
"""Time the non-kernel parts of a training step: gather, Adam, full step."""
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
from neural_admixture_tpu.ops.fused_step import make_fused_training_loss
from neural_admixture_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

M = 1_000_000
N = 4096
B = 800
K = 8
ITERS = 10
m_pad = ((M + 2047) // 2048) * 2048
rng = np.random.default_rng(0)
u32 = rng.integers(0, 2**32, size=(N, m_pad // 16),
                   dtype=np.uint64).astype(np.uint32)
tiles = jax.device_put(np.ascontiguousarray(pk.tiles_from_rows(u32)))
idx = jnp.asarray(rng.permutation(N)[:B])

V = rng.normal(size=(m_pad, 8)).astype(np.float32) * 0.01
P_init = rng.uniform(0.2, 0.8, size=(K, m_pad)).astype(np.float32)
params = qp.init_params(jax.random.PRNGKey(0), V[:, :8], P_init, 1024, [K])
tx = optax.adam(2e-3, b1=0.9, b2=0.95, eps=1e-8)
opt_state = tx.init(params)
cm = jnp.ones((m_pad,), jnp.float32)
rw = jnp.ones((B,), jnp.float32)


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    print(f"{name:30s} {(time.time()-t0)/ITERS*1e3:9.2f} ms", flush=True)


gather = jax.jit(lambda t, i: jnp.take(t, i, axis=1))
timeit("gather (nT,B,128)", gather, tiles, idx)

# block-granular gather (engine sample_block): blk rows per read.
# Strategy A: reshape the tile-major resident to (nT, nblk, blk*128) and
# take along axis 1 (what the engine does today).
for blk in (16, 64):
    nblk = N // blk
    nb_take = B // blk
    rows = nb_take * blk  # ~B, rounded to whole blocks
    bidx = jnp.asarray(rng.permutation(nblk)[:nb_take])
    bg = jax.jit(lambda t, i, blk=blk, nblk=nblk, rows=rows: jnp.take(
        t.reshape(t.shape[0], nblk, blk * t.shape[2]), i, axis=1
    ).reshape(t.shape[0], rows, t.shape[2]))
    timeit(f"gatherA reshape-take blk={blk}", bg, tiles, bidx)

# Strategy B: block-major resident (nblk, nT, blk, 128) -- each index
# slices one fully contiguous nT*blk*512B chunk -- then transpose the
# gathered batch back to tile-major.
for blk in (16, 64):
    nblk = N // blk
    nb_take = B // blk
    rows = nb_take * blk
    nT = tiles.shape[0]
    res_bm = jax.device_put(np.ascontiguousarray(
        np.asarray(tiles).reshape(nT, nblk, blk, 128)
        .transpose(1, 0, 2, 3)))
    bidx = jnp.asarray(rng.permutation(nblk)[:nb_take])
    bg_b = jax.jit(lambda r, i, rows=rows, nT=nT: jnp.take(r, i, axis=0)
                   .transpose(1, 0, 2, 3).reshape(nT, rows, 128))
    timeit(f"gatherB block-major blk={blk}", bg_b, res_bm, bidx)
    gonly = jax.jit(lambda r, i: jnp.take(r, i, axis=0))
    timeit(f"gatherB take only blk={blk}", gonly, res_bm, bidx)
    del res_bm

op = make_fused_training_loss([f"k{K}"])


def loss_fn(p, xb):
    enc = {k: p[k] for k in ("rmsnorm", "common", "heads")}
    loss, qs = op(p["V"], enc, p["decoders"], xb, cm, rw)
    return loss


xb = gather(tiles, idx)
grad_only = jax.jit(lambda p, xb: jax.grad(loss_fn)(p, xb))
timeit("grad (3-pass fused)", grad_only, params, xb)

adam = jax.jit(lambda g, s, p: tx.update(g, s, p))
g0 = grad_only(params, xb)
timeit("adam update", adam, g0, opt_state, params)

clamp = jax.jit(qp.restrict_P)
timeit("restrict_P", clamp, params)


@jax.jit
def full_step(p, s, t, i):
    xb = jnp.take(t, i, axis=1)
    g = jax.grad(loss_fn)(p, xb)
    upd, s = tx.update(g, s, p)
    p = optax.apply_updates(p, upd)
    p = qp.restrict_P(p)
    return p, s


timeit("full step (jit)", full_step, params, opt_state, tiles, idx)
