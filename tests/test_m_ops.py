"""M-tile-batched kernels (pick_m / NA_TPU_M_OPS) must match the
one-tile-per-step program.

ops.fused_step.pick_m batches m_ops consecutive planar SNP tiles into one
(m_ops, tb, TW) block per grid step, amortizing the ~0.45 us fixed cost
per grid step over m_ops tiles (PARITY round-5). Per-tile math is sliced
per slab inside the kernel, so dq/dp/dv/xv VALUES are computed from the
same per-tile dots in the same order -- dq's register accumulation over
the mi loop follows the exact tile order the m_ops=1 grid walks, dp/dv
write disjoint slices, and only the scalar LOSS accumulation order
re-associates (plus whatever fusion/FMA contraction differences the
backend applies to the two program shapes). These tests pin the op at
f32 re-association tolerance between NA_TPU_M_OPS=1 (the production default
program) and the opt-in batched one, with M spanning 4 planar tiles so
the enabled pick really batches -- a slab-slicing or ordering bug would
show as O(1) errors across whole tiles, far outside these gates.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_admixture_tpu.io.packed import pack_with_padding
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.ops.fused_step import pick_m


def test_pick_m(monkeypatch):
    monkeypatch.delenv("NA_TPU_M_OPS", raising=False)
    assert pick_m(4, 400) == 1          # OPT-IN: off when env unset
    monkeypatch.setenv("NA_TPU_M_OPS", "8")
    assert pick_m(1, 400) == 1
    assert pick_m(4, 400) == 4          # divisor <= cap, fits budget
    assert pick_m(489, 400) == 3        # 489 = 3 * 163: only divisor <= 8
    assert pick_m(163, 400) == 1        # prime beyond the cap
    assert pick_m(8, 64) == 8
    # VMEM budget binds: 9 heads at tb=400 leave no room for m > 1
    assert pick_m(489, 400, n_heads=9) == 1
    monkeypatch.setenv("NA_TPU_M_OPS", "1")
    assert pick_m(4, 400) == 1
    monkeypatch.setenv("NA_TPU_M_OPS", "2")
    assert pick_m(4, 400) == 2
    monkeypatch.setenv("NA_TPU_M_OPS", "four")
    with pytest.raises(ValueError, match="NA_TPU_M_OPS"):
        pick_m(4, 400)


def _op_inputs(seed=0, B=32, M=7900, D=4, ks=(3, 5)):
    """M=7900 -> m_pad 8192 = 4 planar tiles, so pick_m at cap 8 batches 4."""
    from neural_admixture_tpu.models import qp

    rng = np.random.default_rng(seed)
    G = rng.integers(0, 4, size=(B, M)).astype(np.uint8)  # incl. missing
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


@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize("merged_loss", [False, True])
def test_m_batched_op_matches_single_tile(monkeypatch, masked, merged_loss):
    from neural_admixture_tpu.ops import fused_step

    params, u32, col_mask, row_w = _op_inputs(seed=3 if masked else 4)
    assert u32.shape[0] == 4            # 4 planar tiles
    enc = {k: params[k] for k in ("rmsnorm", "common", "heads")}
    head_keys = sorted(params["heads"])

    def run(m_ops_env):
        monkeypatch.setenv("NA_TPU_M_OPS", m_ops_env)
        op = fused_step.make_fused_training_loss(
            head_keys, masked=masked, merged_loss=merged_loss)

        def total(V, enc, Ps):
            loss, qs = op(V, enc, Ps, u32, col_mask, row_w)
            return loss + sum(jnp.sum(q ** 2) for q in qs.values())

        val, grads = jax.value_and_grad(total, argnums=(0, 1, 2))(
            params["V"], enc, params["decoders"])
        return val, grads

    v_1, g_1 = run("1")
    v_4, g_4 = run("8")   # picks 4 (largest divisor of nT=4)
    np.testing.assert_allclose(float(v_1), float(v_4), rtol=2e-6)
    for a, b in zip(jax.tree.leaves(g_1), jax.tree.leaves(g_4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)

    v_2, g_2 = run("2")
    np.testing.assert_allclose(float(v_1), float(v_2), rtol=2e-6)
    for a, b in zip(jax.tree.leaves(g_1), jax.tree.leaves(g_2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_m_batched_infer_matches(monkeypatch):
    """fused_infer_q (xv kernel only) under m batching."""
    from neural_admixture_tpu.ops.fused_step import fused_infer_q

    params, u32, _, _ = _op_inputs(seed=5)
    monkeypatch.setenv("NA_TPU_M_OPS", "1")
    q1 = fused_infer_q(params, u32)
    monkeypatch.setenv("NA_TPU_M_OPS", "8")
    q4 = fused_infer_q(params, u32)
    for hk in q1:
        np.testing.assert_allclose(np.asarray(q1[hk]), np.asarray(q4[hk]),
                                   rtol=2e-5, atol=1e-7)


def test_m_batched_engine_training_matches(monkeypatch):
    """End-to-end short Pallas training run: opt-in m batching vs default at
    Adam-amplified re-association tolerance (gate style of
    tests/test_epoch_group)."""
    from neural_admixture_tpu.train.engine import (NeuralAdmixtureTrainer,
                                                   TrainConfig)

    rng = np.random.default_rng(6)
    N, M, D, ks = 48, 7900, 4, (3,)
    G = rng.integers(0, 4, size=(N, M)).astype(np.uint8)
    V = rng.normal(size=(D, M)).astype(np.float32) * 0.1
    P_init = rng.uniform(0.2, 0.8, size=(sum(ks), M)).astype(np.float32)
    packed, _ = pack_with_padding(G)

    def train(m_ops_env):
        monkeypatch.setenv("NA_TPU_M_OPS", m_ops_env)
        cfg = TrainConfig(epochs=3, batch_size=16, learning_rate=1e-2,
                          seed=0, hidden_size=32, ks=list(ks),
                          progress=False, use_pallas=True, sample_block=8)
        tr = NeuralAdmixtureTrainer(cfg)
        return tr.launch_training(P_init.copy(), packed, V, M, N)

    from tests.conftest import assert_trajectory_close

    Qs_1, Ps_1, _ = train("1")
    Qs_4, Ps_4, _ = train("8")
    for a, b in zip(Qs_1 + Ps_1, Qs_4 + Ps_4):
        assert_trajectory_close(a, b, lr=1e-2, atol=5e-5)
