import numpy as np
import pytest

from neural_admixture_tpu.io.packed import pack_2bit_rows, unpack_2bit_rows
from neural_admixture_tpu.native import bed_native
from neural_admixture_tpu.ops.loglikelihood import loglikelihood
from tests.test_io import _encode_bed_bytes

pytestmark = pytest.mark.skipif(not bed_native.available(),
                                reason="native extension not built")


def test_native_decode_matches_numpy():
    rng = np.random.default_rng(0)
    G = rng.integers(0, 4, size=(37, 53)).astype(np.uint8)
    B = _encode_bed_bytes(G)
    out = bed_native.decode_bed(B, 37)
    np.testing.assert_array_equal(out, G)


def test_native_bed_to_packed_matches_host_pack():
    rng = np.random.default_rng(1)
    G = rng.integers(0, 4, size=(29, 70)).astype(np.uint8)
    B = _encode_bed_bytes(G)
    m_pad = 128
    pk = bed_native.bed_to_packed(B, 29, m_pad)
    expected = pack_2bit_rows(G, m_pad=m_pad)
    np.testing.assert_array_equal(pk, expected)


def test_native_pack_2bit_roundtrip():
    rng = np.random.default_rng(2)
    G = rng.integers(0, 4, size=(10, 30)).astype(np.uint8)
    pk = bed_native.pack_2bit(G, 32)
    np.testing.assert_array_equal(unpack_2bit_rows(pk, 30), G)


def test_native_loglikelihood_matches_numpy():
    rng = np.random.default_rng(3)
    N, M, K = 20, 31, 4
    G = rng.integers(0, 4, size=(N, M)).astype(np.uint8)
    Q = rng.dirichlet(np.ones(K), size=N)
    P = rng.uniform(0.05, 0.95, size=(M, K))
    got = bed_native.loglikelihood(G, P, Q)
    expected = loglikelihood(G, P, Q, K)
    np.testing.assert_allclose(got, expected, rtol=1e-12)
