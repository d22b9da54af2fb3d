"""The unmasked (all-real-batch) fused-kernel variant must be EXACT.

The engine runs full batches through kernels with the col_mask/row_weight
operands dropped (ops.fused_step ``masked=False``): padded SNP columns
contribute exactly 0 unmasked because padded packed bits decode to x = 0
and padded P columns are 0 and stay 0 through training. Masking multiplies
real terms by exactly 1.0 and padded terms are exactly 0.0 either way, so
the two programs must agree BIT-FOR-BIT, not just approximately.

NA_TPU_FORCE_MASKED=1 pins the all-masked program for the A/B.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_admixture_tpu.io.packed import pack_with_padding
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.train.engine import (NeuralAdmixtureTrainer,
                                               TrainConfig)


def _op_inputs(seed=0, B=16, M=300, D=4, ks=(3,)):
    """All-real batch with padded SNP columns, in the op's planar layout."""
    from neural_admixture_tpu.models import qp

    rng = np.random.default_rng(seed)
    G = rng.integers(0, 3, size=(B, M)).astype(np.uint8)  # no missing
    packed, _ = pack_with_padding(G)
    m_pad = packed.shape[1] * 4
    perm = pk.planar_perm(m_pad)
    u32 = jnp.asarray(pk.tiles_from_rows(pk.packed_view_u32(packed)))

    V = rng.normal(size=(D, M)).astype(np.float32) * 0.1
    P_init = rng.uniform(0.2, 0.8, size=(sum(ks), M)).astype(np.float32)
    params = qp.init_params(jax.random.PRNGKey(seed), V.T, P_init, 32,
                            list(ks), m_pad=m_pad)
    permj = jnp.asarray(perm)
    params["V"] = params["V"][permj]
    params["decoders"] = {hk: Pk[:, permj]
                          for hk, Pk in params["decoders"].items()}
    col_mask = jnp.asarray(
        (np.arange(m_pad) < M).astype(np.float32)[perm])
    row_w = jnp.ones((B,), jnp.float32)
    return params, u32, col_mask, row_w


@pytest.mark.parametrize("ks", [(3,), (2, 5)])
def test_unmasked_op_is_bit_exact(ks):
    from neural_admixture_tpu.ops.fused_step import make_fused_training_loss

    params, u32, col_mask, row_w = _op_inputs(ks=ks)
    enc = {k: params[k] for k in ("rmsnorm", "common", "heads")}
    head_keys = sorted(params["heads"])

    def run(masked):
        op = make_fused_training_loss(head_keys, masked=masked)

        def total(V, enc, Ps):
            loss, qs = op(V, enc, Ps, u32, col_mask, row_w)
            # drive a nonzero qs cotangent through the VJP too
            return loss + sum(jnp.sum(q ** 2) for q in qs.values())

        val, grads = jax.value_and_grad(total, argnums=(0, 1, 2))(
            params["V"], enc, params["decoders"])
        return val, grads

    v_m, g_m = run(True)
    v_u, g_u = run(False)
    assert float(v_m) == float(v_u)
    for a, b in zip(jax.tree.leaves(g_m), jax.tree.leaves(g_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _train(monkeypatch, force_masked, *, N, blk, batch, ks=(3,),
           supervised=False, mesh_shape=None, epochs=3, seed=1, M=500):
    if force_masked:
        monkeypatch.setenv("NA_TPU_FORCE_MASKED", "1")
    else:
        monkeypatch.delenv("NA_TPU_FORCE_MASKED", raising=False)
    rng = np.random.default_rng(seed)
    D = 4
    G = rng.integers(0, 4, size=(N, M)).astype(np.uint8)
    V = rng.normal(size=(D, M)).astype(np.float32) * 0.1
    P_init = rng.uniform(0.2, 0.8, size=(sum(ks), M)).astype(np.float32)
    pops = rng.integers(0, min(ks), size=N) if supervised else None
    cfg = TrainConfig(epochs=epochs, batch_size=batch, learning_rate=1e-2,
                      seed=0, hidden_size=32, ks=list(ks), progress=False,
                      use_pallas=True, sample_block=blk,
                      mesh_shape=mesh_shape)
    packed, _ = pack_with_padding(G)
    tr = NeuralAdmixtureTrainer(cfg)
    return tr.launch_training(P_init.copy(), packed, V, M, N, pops=pops)


@pytest.mark.parametrize("N,blk,batch,supervised",
                         [(43, 8, 16, False),   # partial block -> remainder
                          (48, 8, 16, False),   # N % blk == 0
                          (43, 1, 16, False),   # per-row sampling
                          (43, 8, 16, True)])
def test_unmasked_engine_matches_forced_masked(monkeypatch, N, blk, batch,
                                               supervised):
    Qs_m, Ps_m, _ = _train(monkeypatch, True, N=N, blk=blk, batch=batch,
                           supervised=supervised)
    Qs_u, Ps_u, _ = _train(monkeypatch, False, N=N, blk=blk, batch=batch,
                           supervised=supervised)
    for a, b in zip(Qs_m + Ps_m, Qs_u + Ps_u):
        np.testing.assert_array_equal(a, b)


def test_unmasked_engine_matches_forced_masked_on_mesh(monkeypatch):
    # M=4096 -> two planar tiles, the snp-axis minimum for n_snp=2.
    Qs_m, Ps_m, _ = _train(monkeypatch, True, N=43, blk=1, batch=16,
                           mesh_shape=(2, 2), M=4096, epochs=2)
    Qs_u, Ps_u, _ = _train(monkeypatch, False, N=43, blk=1, batch=16,
                           mesh_shape=(2, 2), M=4096, epochs=2)
    for a, b in zip(Qs_m + Ps_m, Qs_u + Ps_u):
        np.testing.assert_array_equal(a, b)
