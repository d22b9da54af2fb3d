"""Fused Pallas kernels vs the XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from neural_admixture_tpu.io.packed import pack_2bit_rows
from neural_admixture_tpu.ops import pack as pk
from neural_admixture_tpu.ops.fused import (fused_clamped_bce_sum, packed_xv,
                                            pick_tb)
from neural_admixture_tpu.ops.loss import clamped_bce_sum


def _setup(B=16, M=3000, m_pad=4096, K=5, seed=0):
    rng = np.random.default_rng(seed)
    G = rng.integers(0, 4, size=(B, M)).astype(np.uint8)
    packed = pack_2bit_rows(G, m_pad=m_pad)
    u32 = jnp.asarray(pk.packed_view_u32(packed))
    perm = pk.planar_perm(m_pad)
    Q = jnp.asarray(rng.dirichlet(np.ones(K), size=B).astype(np.float32))
    P = jnp.asarray(rng.uniform(-0.1, 1.1, size=(K, m_pad)).astype(np.float32))
    cm = jnp.asarray((np.arange(m_pad) < M).astype(np.float32))
    rw = jnp.asarray((rng.uniform(size=B) > 0.2).astype(np.float32))
    return G, u32, perm, Q, P, cm, rw, m_pad


def test_planar_unpack_is_permuted_unpack():
    G, u32, perm, *_ , m_pad = _setup()
    g_planar = np.asarray(pk.unpack_genotypes_planar(u32))
    G_pad = np.zeros((G.shape[0], m_pad), np.uint8)
    G_pad[:, :G.shape[1]] = G
    np.testing.assert_array_equal(g_planar, G_pad[:, perm])


def test_planar_perm_is_permutation():
    perm = pk.planar_perm(4096)
    assert sorted(perm.tolist()) == list(range(4096))
    inv = pk.inverse_perm(perm)
    np.testing.assert_array_equal(perm[inv], np.arange(4096))


def test_fused_bce_matches_reference_loss_and_grads():
    G, u32, perm, Q, P, cm, rw, m_pad = _setup()
    permj = jnp.asarray(perm)

    def ref_loss(Q, P):
        x = pk.unpack_dosage_x(jnp.asarray(pack_2bit_rows(G, m_pad=m_pad)))
        raw = Q @ P
        return clamped_bce_sum(raw, x, cm, rw)

    def fused_loss(Q, P):
        return fused_clamped_bce_sum(Q, P[:, permj], u32, cm[permj], rw)

    l_ref, (dq_ref, dp_ref) = jax.value_and_grad(ref_loss, argnums=(0, 1))(Q, P)
    l_fus, (dq_fus, dp_fus) = jax.value_and_grad(fused_loss, argnums=(0, 1))(Q, P)

    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(dq_fus), np.asarray(dq_ref),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dp_fus), np.asarray(dp_ref),
                               rtol=2e-4, atol=2e-3)


def test_packed_xv_matches_reference_and_dv():
    G, u32, perm, *_ , m_pad = _setup()
    rng = np.random.default_rng(1)
    D = 8
    V = jnp.asarray(rng.normal(size=(m_pad, D)).astype(np.float32) * 0.1)
    permj = jnp.asarray(perm)

    x = pk.unpack_dosage_x(jnp.asarray(pack_2bit_rows(G, m_pad=m_pad)))

    def ref(V):
        return jnp.sum(jnp.sin(x @ V))

    def fused(V):
        return jnp.sum(jnp.sin(packed_xv(u32, V[permj])))

    y_ref, dv_ref = jax.value_and_grad(ref)(V)
    y_fus, dv_fus = jax.value_and_grad(fused)(V)
    np.testing.assert_allclose(float(y_fus), float(y_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dv_fus), np.asarray(dv_ref),
                               rtol=1e-4, atol=1e-5)


def test_fast_recip_backward_matches_exact(monkeypatch):
    """Pin the production (approx-reciprocal) backward branch: force it on
    in interpret mode and compare against the exact-division gradients
    (interpret emulation error ~1e-3; the real TPU unit is ~8e-6)."""
    G, u32, perm, Q, P, cm, rw, m_pad = _setup()
    permj = jnp.asarray(perm)

    def loss(Q, P):
        return fused_clamped_bce_sum(Q, P[:, permj], u32, cm[permj], rw)

    monkeypatch.setenv("NA_TPU_EXACT_DIV", "1")
    dq_e, dp_e = jax.grad(loss, argnums=(0, 1))(Q, P)
    monkeypatch.setenv("NA_TPU_EXACT_DIV", "0")
    dq_a, dp_a = jax.grad(loss, argnums=(0, 1))(Q, P)

    np.testing.assert_allclose(np.asarray(dq_a), np.asarray(dq_e),
                               rtol=5e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(dp_a), np.asarray(dp_e),
                               rtol=5e-3, atol=5e-2)


def test_pick_tb():
    assert pick_tb(800) == 200
    assert pick_tb(1024) == 256
    assert pick_tb(256) == 256
    assert pick_tb(8) == 8
    assert pick_tb(24) == 24
