import numpy as np
import pytest

from neural_admixture_tpu.io.packed import pack_with_padding
from neural_admixture_tpu.train.engine import NeuralAdmixtureTrainer, TrainConfig
from neural_admixture_tpu.train.init import encode_populations, init_p_supervised


def _admixed_data(N=120, M=400, K=3, seed=0):
    rng = np.random.default_rng(seed)
    F = rng.uniform(0.05, 0.95, size=(M, K))
    labels = rng.integers(0, K, size=N)
    Q = np.eye(K)[labels] * 0.9 + 0.1 / K
    G = rng.binomial(2, Q @ F.T).astype(np.uint8)
    return G, labels


def test_encode_populations():
    y, d = encode_populations(["EUR", "AFR", "EAS", "AFR"], 3)
    assert d == {"AFR": 0, "EAS": 1, "EUR": 2}
    np.testing.assert_array_equal(y, [2, 0, 1, 0])
    with pytest.raises(AssertionError):
        encode_populations(["A", "B"], 3)


def test_supervised_p_init_uses_raw_dosage_scale():
    G = np.array([[0, 2, 3], [2, 2, 3], [0, 0, 0]], dtype=np.uint8)
    y = np.array([0, 0, 1])
    P = init_p_supervised(G, y, 2)
    # class 0 mean of raw values (missing 3 included, like the reference)
    np.testing.assert_allclose(P[0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(P[1], [0.0, 0.0, 0.0])


def test_supervised_training_recovers_labels():
    G, labels = _admixed_data()
    N, M = G.shape
    K = 3
    y, _ = encode_populations([f"P{l}" for l in labels], K)
    # encode_populations sorts label names, P0<P1<P2 keeps the order
    P_init = init_p_supervised(G, y, K)
    rng = np.random.default_rng(1)
    V = rng.normal(size=(8, M)).astype(np.float32) * 0.1
    packed, _ = pack_with_padding(G)
    # A strong CE weight makes convergence fast enough for a unit test (the
    # reference default of 100 needs its default 250 epochs to align columns;
    # the flag is wired through, which is what this exercises).
    cfg = TrainConfig(epochs=20, batch_size=64, learning_rate=5e-3, seed=0,
                      hidden_size=64, ks=[K], progress=False,
                      supervised_loss_weight=10000.0)
    tr = NeuralAdmixtureTrainer(cfg)
    Qs, Ps, _ = tr.launch_training(P_init, packed, V, M, N, pops=y)
    pred = Qs[0].argmax(axis=1)
    acc = (pred == y).mean()
    assert acc > 0.9, acc
