"""Head-grouped heavy kernels (NA_TPU_HEAD_GROUPS) must match the
all-heads-one-call program.

ops.fused_step.head_group_plan splits the heads into S groups, one heavy
pallas call each (VERDICT r4 #7; measured inferior to the default
one-call-wide program on v5e, kept as an A/B knob and the >12-head
fallback -- PARITY round-5). Grouping changes ONLY float accumulation
order: per-head dq/dp math is independent inside the kernel, so splitting
the head loop across calls is a pure re-association (plus a possibly
different tile width when group sizes straddle the 12-head cap
boundary). These tests pin loss and every gradient leaf between grouped
and ungrouped programs at f32 re-association tolerance -- an O(1)
head-slicing or ordering bug cannot hide inside it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_admixture_tpu.io.packed import pack_with_padding
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.ops.fused_step import head_group_plan


def test_head_group_plan(monkeypatch):
    monkeypatch.delenv("NA_TPU_HEAD_GROUPS", raising=False)
    assert head_group_plan(9) == [9]
    monkeypatch.setenv("NA_TPU_HEAD_GROUPS", "2")
    assert head_group_plan(9) == [5, 4]
    assert head_group_plan(4) == [2, 2]
    assert head_group_plan(1) == [1]        # clamped to n_heads
    monkeypatch.setenv("NA_TPU_HEAD_GROUPS", "3")
    assert head_group_plan(9) == [3, 3, 3]
    assert head_group_plan(7) == [3, 2, 2]
    monkeypatch.setenv("NA_TPU_HEAD_GROUPS", "0")
    assert head_group_plan(5) == [5]        # clamped up to 1 group
    monkeypatch.setenv("NA_TPU_HEAD_GROUPS", "two")
    with pytest.raises(ValueError, match="NA_TPU_HEAD_GROUPS"):
        head_group_plan(5)


def _op_inputs(seed=0, B=304, M=300, D=4, ks=(2, 3, 4)):
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
def test_grouped_op_matches_ungrouped(monkeypatch, masked, merged_loss):
    from neural_admixture_tpu.ops import fused_step

    params, u32, col_mask, row_w = _op_inputs(
        ks=(2, 3, 4), seed=1 if masked else 2)
    enc = {k: params[k] for k in ("rmsnorm", "common", "heads")}
    head_keys = sorted(params["heads"])

    def run(groups):
        if groups:
            monkeypatch.setenv("NA_TPU_HEAD_GROUPS", str(groups))
        else:
            monkeypatch.delenv("NA_TPU_HEAD_GROUPS", raising=False)
        op = fused_step.make_fused_training_loss(
            head_keys, masked=masked, merged_loss=merged_loss)

        def total(V, enc, Ps):
            loss, qs = op(V, enc, Ps, u32, col_mask, row_w)
            return loss + sum(jnp.sum(q ** 2) for q in qs.values())

        val, grads = jax.value_and_grad(total, argnums=(0, 1, 2))(
            params["V"], enc, params["decoders"])
        return val, grads

    v_1, g_1 = run(0)
    v_2, g_2 = run(2)   # [2, 1] heads
    np.testing.assert_allclose(float(v_1), float(v_2), rtol=2e-6)
    for a, b in zip(jax.tree.leaves(g_1), jax.tree.leaves(g_2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-6)

    v_3, g_3 = run(3)   # one call per head, all at the single-head cap
    np.testing.assert_allclose(float(v_1), float(v_3), rtol=2e-6)
    for a, b in zip(jax.tree.leaves(g_1), jax.tree.leaves(g_3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-6)


def test_grouped_engine_training_matches(monkeypatch):
    """End-to-end: a short multi-head Pallas training run under
    NA_TPU_HEAD_GROUPS=2 matches the default program at Adam-amplified
    re-association tolerance (same gate style as tests/test_epoch_group)."""
    from neural_admixture_tpu.train.engine import (NeuralAdmixtureTrainer,
                                                   TrainConfig)

    rng = np.random.default_rng(3)
    N, M, D, ks = 48, 300, 4, (2, 3, 4)
    G = rng.integers(0, 4, size=(N, M)).astype(np.uint8)
    V = rng.normal(size=(D, M)).astype(np.float32) * 0.1
    P_init = rng.uniform(0.2, 0.8, size=(sum(ks), M)).astype(np.float32)
    packed, _ = pack_with_padding(G)

    def train(groups):
        if groups:
            monkeypatch.setenv("NA_TPU_HEAD_GROUPS", str(groups))
        else:
            monkeypatch.delenv("NA_TPU_HEAD_GROUPS", raising=False)
        cfg = TrainConfig(epochs=3, batch_size=16, learning_rate=1e-2,
                          seed=0, hidden_size=32, ks=list(ks),
                          progress=False, use_pallas=True, sample_block=8)
        tr = NeuralAdmixtureTrainer(cfg)
        return tr.launch_training(P_init.copy(), packed, V, M, N)

    from tests.conftest import assert_trajectory_close

    Qs_1, Ps_1, _ = train(0)
    Qs_2, Ps_2, _ = train(2)
    for a, b in zip(Qs_1 + Ps_1, Qs_2 + Ps_2):
        assert_trajectory_close(a, b, lr=1e-2, atol=5e-5)
