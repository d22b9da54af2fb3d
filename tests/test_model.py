import jax
import jax.numpy as jnp
import numpy as np
import torch

from neural_admixture_tpu.models import qp


def _torch_forward(params, X_np, ks):
    """Independent torch re-computation of the Q_P forward math
    (X@V -> RMSNorm -> Linear+ReLU -> heads -> softmax -> Q@P, clamp)."""
    X = torch.tensor(X_np)
    V = torch.tensor(np.asarray(params["V"]))
    Xp = X @ V
    w = torch.tensor(np.asarray(params["rmsnorm"]["weight"]))
    h = torch.nn.functional.rms_norm(Xp, (Xp.shape[-1],), weight=w, eps=1e-8)
    W1 = torch.tensor(np.asarray(params["common"]["kernel"]))
    b1 = torch.tensor(np.asarray(params["common"]["bias"]))
    e = torch.relu(h @ W1 + b1)
    recs, qs = {}, {}
    for k in ks:
        hk = f"k{k}"
        Wh = torch.tensor(np.asarray(params["heads"][hk]["kernel"]))
        bh = torch.tensor(np.asarray(params["heads"][hk]["bias"]))
        q = torch.softmax(e @ Wh + bh, dim=1)
        P = torch.tensor(np.asarray(params["decoders"][hk]))
        recs[hk] = torch.clamp(q @ P, 0, 1)
        qs[hk] = q
    return recs, qs


def _make_params(M=40, D=4, H=16, ks=(3, 5), seed=0):
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(M, D)).astype(np.float32)
    P_init = rng.uniform(0.1, 0.9, size=(sum(ks), M)).astype(np.float32)
    return qp.init_params(jax.random.PRNGKey(seed), V, P_init, H, list(ks))


def test_forward_matches_torch():
    ks = [3, 5]
    params = _make_params(ks=tuple(ks))
    rng = np.random.default_rng(1)
    X = (rng.integers(0, 3, size=(6, 40)) / 2.0).astype(np.float32)

    recs, qs = qp.forward_train(params, jnp.asarray(X))
    t_recs, t_qs = _torch_forward(params, X, ks)

    for k in ks:
        hk = f"k{k}"
        np.testing.assert_allclose(np.asarray(qs[hk]), t_qs[hk].numpy(),
                                   rtol=2e-4, atol=2e-6)
        np.testing.assert_allclose(
            np.clip(np.asarray(recs[hk]), 0, 1), t_recs[hk].numpy(),
            rtol=2e-4, atol=2e-6)


def test_q_rows_on_simplex():
    params = _make_params()
    X = np.random.default_rng(2).uniform(0, 1, size=(8, 40)).astype(np.float32)
    qs = qp.forward_infer(params, jnp.asarray(X))
    for q in qs.values():
        np.testing.assert_allclose(np.asarray(q).sum(axis=1), 1.0, rtol=1e-5)
        assert (np.asarray(q) >= 0).all()


def test_decoder_init_slices_P_by_k_groups():
    ks = [2, 3]
    rng = np.random.default_rng(3)
    V = rng.normal(size=(10, 4)).astype(np.float32)
    P_init = rng.uniform(size=(5, 10)).astype(np.float32)
    params = qp.init_params(jax.random.PRNGKey(0), V, P_init, 8, ks)
    np.testing.assert_array_equal(np.asarray(params["decoders"]["k2"]),
                                  P_init[:2])
    np.testing.assert_array_equal(np.asarray(params["decoders"]["k3"]),
                                  P_init[2:5])


def test_restrict_P_clamps():
    params = _make_params()
    params["decoders"]["k3"] = params["decoders"]["k3"].at[0, 0].set(1.7)
    params["decoders"]["k3"] = params["decoders"]["k3"].at[0, 1].set(-0.5)
    out = qp.restrict_P(params)
    P = np.asarray(out["decoders"]["k3"])
    assert P.max() <= 1.0 and P.min() >= 0.0


def test_m_padding_zero_extends():
    params = _make_params(M=40)
    rng = np.random.default_rng(4)
    V = rng.normal(size=(40, 4)).astype(np.float32)
    P_init = rng.uniform(size=(3, 40)).astype(np.float32)
    padded = qp.init_params(jax.random.PRNGKey(0), V, P_init, 16, [3],
                            m_pad=64)
    assert padded["V"].shape == (64, 4)
    assert padded["decoders"]["k3"].shape == (3, 64)
    np.testing.assert_array_equal(np.asarray(padded["V"][40:]), 0)
    np.testing.assert_array_equal(np.asarray(padded["decoders"]["k3"][:, 40:]), 0)
