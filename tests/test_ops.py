import jax
import jax.numpy as jnp
import numpy as np
import torch

from neural_admixture_tpu.io.packed import pack_2bit_rows
from neural_admixture_tpu.ops import (clamped_bce_sum, loglikelihood,
                                      loglikelihood_device,
                                      softmax_cross_entropy_sum,
                                      unpack_dosage_x, unpack_genotypes)


def test_unpack_genotypes_matches_host():
    rng = np.random.default_rng(2)
    G = rng.integers(0, 4, size=(6, 16)).astype(np.uint8)
    pk = pack_2bit_rows(G)
    out = np.asarray(unpack_genotypes(jnp.asarray(pk)))
    np.testing.assert_array_equal(out, G)


def test_unpack_dosage_x_imputes_missing():
    G = np.array([[0, 1, 2, 3]], dtype=np.uint8)
    pk = pack_2bit_rows(G)
    x = np.asarray(unpack_dosage_x(jnp.asarray(pk)))
    np.testing.assert_allclose(x, [[0.0, 0.5, 1.0, 0.0]])


def test_clamped_bce_matches_torch():
    """Value and gradient parity with torch: clamp(0,1) then
    BCELoss(reduction='sum'), as in the reference forward/loss
    (model/neural_admixture.py:97, :431)."""
    rng = np.random.default_rng(3)
    B, M = 7, 33
    raw = rng.normal(0.5, 0.6, size=(B, M)).astype(np.float32)  # spills out of [0,1]
    x = (rng.integers(0, 3, size=(B, M)) / 2.0).astype(np.float32)
    col_mask = np.ones(M, np.float32)
    row_w = np.ones(B, np.float32)

    t_raw = torch.tensor(raw, requires_grad=True)
    t_rec = torch.clamp(t_raw, 0, 1)
    t_loss = torch.nn.BCELoss(reduction="sum")(t_rec, torch.tensor(x))
    t_loss.backward()

    f = lambda r: clamped_bce_sum(r, jnp.asarray(x), jnp.asarray(col_mask),
                                  jnp.asarray(row_w))
    j_loss, j_grad = jax.value_and_grad(f)(jnp.asarray(raw))

    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(j_grad), t_raw.grad.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_clamped_bce_masks_padding():
    raw = jnp.ones((2, 4)) * 0.3
    x = jnp.ones((2, 4)) * 0.5
    col_mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    row_w = jnp.asarray([1.0, 0.0])
    loss, grad = jax.value_and_grad(
        lambda r: clamped_bce_sum(r, x, col_mask, row_w))(raw)
    # only (row 0, cols 0-1) contribute
    assert np.asarray(grad)[1].sum() == 0
    assert np.asarray(grad)[0, 2:].sum() == 0
    expected = -2 * (0.5 * np.log(0.3) + 0.5 * np.log(0.7))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


def test_softmax_ce_matches_torch():
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(5, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=5)
    t = torch.nn.CrossEntropyLoss(reduction="sum")(
        torch.tensor(logits), torch.tensor(labels))
    j = softmax_cross_entropy_sum(jnp.asarray(logits),
                                  jnp.asarray(labels), jnp.ones(5))
    np.testing.assert_allclose(float(j), float(t), rtol=1e-5)


def test_loglikelihood_masks_missing_and_matches_reference_formula():
    rng = np.random.default_rng(5)
    N, M, K = 11, 17, 3
    G = rng.integers(0, 4, size=(N, M)).astype(np.uint8)
    Q = rng.dirichlet(np.ones(K), size=N)
    P = rng.uniform(0.1, 0.9, size=(M, K))

    # direct reference formula (utils.pyx:17-40)
    eps = 1e-6
    expected = 0.0
    for i in range(N):
        for j in range(M):
            if G[i, j] != 3:
                rec = float(np.clip(Q[i] @ P[j], eps, 1 - eps))
                g = float(np.clip(G[i, j], eps, 2 - eps))
                expected += g * np.log(rec) + (2 - g) * np.log1p(-rec)

    got = loglikelihood(G, P, Q, K)
    np.testing.assert_allclose(got, expected, rtol=1e-10)
    got_dev = loglikelihood_device(G, P, Q, K)
    np.testing.assert_allclose(got_dev, expected, rtol=1e-4)
