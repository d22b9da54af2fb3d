"""Gather-free (indexed) kernels A/B vs the gathered-batch program.

With NA_TPU_INDEXED=1 the engine's FULL batches on the unsharded Pallas
path read their sampled blocks straight from the resident array via
scalar-prefetch index maps (ops.fused_step.make_indexed_training_loss)
instead of materializing a gathered batch. The gathered program is the
production default (measured faster end-to-end on v5e; see
train/engine.py); these tests pin that the opt-in indexed program
computes the same thing.

Bit-exactness caveat: the indexed program tiles the batch at tb ==
sample_block while the gathered one tiles at pick_tb(B), so the loss/dp
accumulation ORDER differs when the tilings differ -- last-ulp float
drift, not a transport bug. The tests therefore pin:
  * bit-for-bit agreement whenever the tilings coincide (op level at
    tb == blk; engine level at batch_size == sample_block);
  * tight allclose at realistic mixed tilings.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_admixture_tpu.models import qp
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.ops.fused_step import (_dq_dp_call, _dv_call,
                                                 _loss_call, _xv_call,
                                                 make_indexed_training_loss,
                                                 pick_g)
from neural_admixture_tpu.io.packed import pack_with_padding
from neural_admixture_tpu.train.engine import (NeuralAdmixtureTrainer,
                                               TrainConfig)


def test_indexed_transport_bit_exact():
    """Each indexed pallas call == its gathered twin at the SAME tiling.

    The indexed mode DMAs pick_g(nbk, blk) sampled blocks per grid step
    and concatenates them into one tile, so its math matches a gathered
    call at tb == g*blk exactly; comparing at that tb pins the
    scalar-prefetch transport (offsets, order, no aliasing), the one
    thing the indexed mode changes."""
    rng = np.random.default_rng(3)
    N, M, D, blk, nbk = 64, 300, 4, 8, 4
    ks = [3, 5]
    G = rng.integers(0, 4, size=(N, M)).astype(np.uint8)
    packed, m_pad = pack_with_padding(G)
    u32 = pk.packed_view_u32(np.asarray(packed))
    resident = jnp.asarray(pk.tiles_from_rows(u32))

    blk_idx = jnp.asarray(rng.choice(N // blk, size=nbk, replace=False),
                          jnp.int32)
    B = nbk * blk
    row_idx = (np.asarray(blk_idx)[:, None] * blk
               + np.arange(blk)).reshape(-1)
    xb = resident[:, row_idx, :]

    V = jnp.asarray(rng.normal(size=(m_pad, D)).astype(np.float32) * 0.1)
    qs = [jnp.asarray(rng.uniform(0.01, 0.99, size=(B, k))
                      .astype(np.float32)) for k in ks]
    Ps = [jnp.asarray(rng.uniform(0.2, 0.8, size=(k, m_pad))
                      .astype(np.float32)) for k in ks]
    dXp = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    tbe = pick_g(nbk, blk) * blk  # the gathered twin's matching tiling
    assert tbe == 32

    a = _xv_call(xb, V, tbe)
    b = _xv_call(resident, V, blk, blk_idx=blk_idx)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    a = _loss_call(qs, Ps, xb, None, None, tbe, masked=False)
    b = _loss_call(qs, Ps, resident, None, None, blk, masked=False,
                   blk_idx=blk_idx)
    assert float(a) == float(b)

    g = jnp.float32(1.7)
    dqs_a, dps_a = _dq_dp_call(qs, Ps, xb, None, None, g, tbe, masked=False)
    dqs_b, dps_b = _dq_dp_call(qs, Ps, resident, None, None, g, blk,
                               masked=False, blk_idx=blk_idx)
    for x, y in zip(dqs_a + list(dps_a), dqs_b + list(dps_b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    a = _dv_call(xb, dXp, tbe)
    b = _dv_call(resident, dXp, blk, blk_idx=blk_idx)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_indexed_op_grads_close():
    """Full custom-VJP op vs a dense XLA reference: allclose only. The
    kernel computes the torch-parity draw (rec-x)/max(rec(1-rec),1e-12)
    while autodiff of clamped_bce_sum rounds the same quantity through
    two divisions, so near clamp boundaries elements differ at ~1e-3
    relative; bit-exactness is pinned by the transport/engine tests."""
    rng = np.random.default_rng(5)
    N, M, D, blk, nbk = 64, 300, 4, 8, 4
    ks = [3]
    G = rng.integers(0, 4, size=(N, M)).astype(np.uint8)
    packed, m_pad = pack_with_padding(G)
    u32 = pk.packed_view_u32(np.asarray(packed))
    resident = jnp.asarray(pk.tiles_from_rows(u32))
    blk_idx = jnp.asarray(rng.choice(N // blk, size=nbk, replace=False),
                          jnp.int32)
    row_idx = (np.asarray(blk_idx)[:, None] * blk
               + np.arange(blk)).reshape(-1)
    # Dense reference in PLANAR coordinates (the system resident/V/P share).
    X = pk.unpack_dosage_x_planar(jnp.asarray(u32[row_idx]))

    V = rng.normal(size=(m_pad, D)).astype(np.float32) * 0.1
    params = qp.init_params(jax.random.PRNGKey(0), jnp.asarray(V),
                            jnp.asarray(rng.uniform(
                                0.2, 0.8, size=(sum(ks), m_pad)
                            ).astype(np.float32)), 16, ks)
    enc = {k: params[k] for k in ("rmsnorm", "common", "heads")}
    op_i = make_indexed_training_loss(sorted(params["heads"]), blk)

    def total_i(V, enc, Ps):
        loss, qs = op_i(V, enc, Ps, resident, blk_idx)
        return loss + sum(jnp.sum(q ** 2) for q in qs.values())

    from neural_admixture_tpu.ops.loss import clamped_bce_sum

    def total_ref(V, enc, Ps):
        Xp = X @ V
        qs = qp.encode_from_xp(enc, Xp)
        loss = sum(clamped_bce_sum(qs[hk] @ Ps[hk], X,
                                   jnp.ones((m_pad,)), jnp.ones((X.shape[0],)))
                   for hk in qs)
        return loss + sum(jnp.sum(q ** 2) for q in qs.values())

    v_i, g_i = jax.value_and_grad(total_i, argnums=(0, 1, 2))(
        params["V"], enc, params["decoders"])
    v_r, g_r = jax.value_and_grad(total_ref, argnums=(0, 1, 2))(
        params["V"], enc, params["decoders"])
    np.testing.assert_allclose(float(v_i), float(v_r), rtol=2e-6)
    for a, b in zip(jax.tree.leaves(g_i), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


def _train(monkeypatch, force_gather, *, N=43, blk=8, batch=16, ks=(3,),
           supervised=False, epochs=3, M=500):
    if force_gather:
        monkeypatch.delenv("NA_TPU_INDEXED", raising=False)
    else:
        monkeypatch.setenv("NA_TPU_INDEXED", "1")
    rng = np.random.default_rng(7)
    D = 4
    G = rng.integers(0, 4, size=(N, M)).astype(np.uint8)
    V = rng.normal(size=(D, M)).astype(np.float32) * 0.1
    P_init = rng.uniform(0.2, 0.8, size=(sum(ks), M)).astype(np.float32)
    pops = rng.integers(0, min(ks), size=N) if supervised else None
    # mesh_shape (1, 1) -> unsharded single-device path (the indexed
    # program's scope) even on the 8-device test backend.
    cfg = TrainConfig(epochs=epochs, batch_size=batch, learning_rate=1e-2,
                      seed=0, hidden_size=32, ks=list(ks), progress=False,
                      use_pallas=True, sample_block=blk, mesh_shape=(1, 1))
    packed, _ = pack_with_padding(G)
    tr = NeuralAdmixtureTrainer(cfg)
    return tr.launch_training(P_init.copy(), packed, V, M, N, pops=pops)


@pytest.mark.parametrize("supervised", [False, True])
def test_indexed_engine_bit_exact_at_equal_tiling(monkeypatch, supervised):
    """batch_size == sample_block -> both programs tile at tb=blk ->
    bit-for-bit identical training."""
    kw = dict(N=43, blk=8, batch=8, supervised=supervised)
    Qs_g, Ps_g, _ = _train(monkeypatch, True, **kw)
    Qs_i, Ps_i, _ = _train(monkeypatch, False, **kw)
    for a, b in zip(Qs_g + Ps_g, Qs_i + Ps_i):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("ks", [(3,), (3, 5)])
def test_indexed_engine_close_at_mixed_tiling(monkeypatch, ks):
    kw = dict(N=43, blk=8, batch=16, ks=ks)
    Qs_g, Ps_g, _ = _train(monkeypatch, True, **kw)
    Qs_i, Ps_i, _ = _train(monkeypatch, False, **kw)
    for a, b in zip(Qs_g + Ps_g, Qs_i + Ps_i):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("force_gather", [False, True])
def test_merged_logged_loss_bit_exact(monkeypatch, force_gather):
    """NA_TPU_SPLIT_LOSS=1 (split loss pass + dq_dp) vs the merged
    loss+dq+dp program on logged epochs: training results bit-identical
    (the loss cotangent is exactly 1.0, so the merged kernel's unscaled
    dq/dp match the split kernel's bit-for-bit; only the logged loss
    VALUE's accumulation order differs)."""
    def run(split):
        if split:
            monkeypatch.setenv("NA_TPU_SPLIT_LOSS", "1")
        else:
            monkeypatch.delenv("NA_TPU_SPLIT_LOSS", raising=False)
        # log_every=1 -> every epoch runs the logged (merged) program.
        rng = np.random.default_rng(11)
        N, M, D = 43, 500, 4
        G = rng.integers(0, 4, size=(N, M)).astype(np.uint8)
        V = rng.normal(size=(D, M)).astype(np.float32) * 0.1
        P_init = rng.uniform(0.2, 0.8, size=(3, M)).astype(np.float32)
        cfg = TrainConfig(epochs=3, batch_size=16, learning_rate=1e-2,
                          seed=0, hidden_size=32, ks=[3], progress=False,
                          use_pallas=True, sample_block=8, log_every=1,
                          mesh_shape=(1, 1))
        packed, _ = pack_with_padding(G)
        tr = NeuralAdmixtureTrainer(cfg)
        return tr.launch_training(P_init.copy(), packed, V, M, N)

    if force_gather:
        monkeypatch.delenv("NA_TPU_INDEXED", raising=False)
    else:
        monkeypatch.setenv("NA_TPU_INDEXED", "1")
    Qs_s, Ps_s, _ = run(True)
    Qs_m, Ps_m, _ = run(False)
    for a, b in zip(Qs_s + Ps_s, Qs_m + Ps_m):
        np.testing.assert_array_equal(a, b)
