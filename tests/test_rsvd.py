import numpy as np

from neural_admixture_tpu.io.packed import pack_with_padding
from neural_admixture_tpu.ops.rsvd import rsvd, svd_flip


def _subspace_alignment(A, B):
    """Mean cosine of principal angles between row-spaces of A and B (k, M)."""
    Qa, _ = np.linalg.qr(A.T)
    Qb, _ = np.linalg.qr(B.T)
    s = np.linalg.svd(Qa.T @ Qb, compute_uv=False)
    return float(np.mean(s))


def _make_genotypes(N=300, M=700, K=4, seed=0):
    """Synthetic admixed genotypes: F ~ (M, K) freqs, Q ~ dirichlet, G ~ Bin(2)."""
    rng = np.random.default_rng(seed)
    F = rng.uniform(0.05, 0.95, size=(M, K))
    Q = rng.dirichlet(np.ones(K) * 0.3, size=N)
    probs = Q @ F.T
    G = rng.binomial(2, probs).astype(np.uint8)
    return G


def test_rsvd_matches_dense_svd_subspace():
    G = _make_genotypes()
    N, M = G.shape
    packed, _ = pack_with_padding(G)
    Vt = rsvd(packed, N, M, k=8, seed=42)
    assert Vt.shape == (8, M)

    _, _, Vt_dense = np.linalg.svd(G.astype(np.float32), full_matrices=False)
    # The data has true rank K=4 (+ binomial noise): the signal subspace must
    # align almost perfectly; trailing noise directions are not comparable.
    align = _subspace_alignment(Vt[:4], Vt_dense[:4])
    assert align > 0.999, align

    # And the rank-8 projection must capture as much energy as dense SVD's.
    Gf = G.astype(np.float32)
    err = np.linalg.norm(Gf - Gf @ Vt.T @ Vt) / np.linalg.norm(Gf)
    err_dense = (np.linalg.norm(Gf - Gf @ Vt_dense[:8].T @ Vt_dense[:8])
                 / np.linalg.norm(Gf))
    assert err < err_dense * 1.005, (err, err_dense)


def test_rsvd_deterministic():
    G = _make_genotypes(N=100, M=200)
    packed, _ = pack_with_padding(G)
    V1 = rsvd(packed, 100, 200, k=4, seed=7)
    V2 = rsvd(packed, 100, 200, k=4, seed=7)
    np.testing.assert_array_equal(V1, V2)


def test_rsvd_ignores_padding_columns():
    G = _make_genotypes(N=64, M=130)
    p1, _ = pack_with_padding(G, lane_multiple=512)
    p2, _ = pack_with_padding(G, lane_multiple=1024)
    V1 = rsvd(p1, 64, 130, k=4, seed=3)
    V2 = rsvd(p2, 64, 130, k=4, seed=3)
    np.testing.assert_allclose(V1, V2, atol=1e-4)


def test_svd_flip_sign_convention():
    rng = np.random.default_rng(1)
    U = rng.normal(size=(10, 3))
    V = rng.normal(size=(3, 20))
    flipped = np.asarray(svd_flip(V, U))
    idx = np.argmax(np.abs(U), axis=0)
    signs = np.sign(U[idx, np.arange(3)])
    np.testing.assert_allclose(flipped, V * signs[:, None], rtol=1e-6)
