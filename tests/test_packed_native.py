"""The packed-native BED path must reproduce the dense path exactly."""
import numpy as np

from neural_admixture_tpu.io import bed
from neural_admixture_tpu.io.packed import pack_2bit_rows, unpack_2bit_rows
from neural_admixture_tpu.io.snp_reader import SNPReader
from neural_admixture_tpu.ops.loglikelihood import (loglikelihood,
                                                    loglikelihood_packed)
from neural_admixture_tpu.train.init import (init_p_supervised,
                                             init_p_supervised_packed)
from tests.conftest import DEMO_BED
from tests.test_io import _encode_bed_bytes


def _write_bed(tmp_path, G):
    B = _encode_bed_bytes(G)
    p = tmp_path / "t.bed"
    with open(p, "wb") as f:
        f.write(b"\x6c\x1b\x01" + B.tobytes())
    (tmp_path / "t.fam").write_text("x\n" * G.shape[0])
    return str(p)


def test_flip_packed_minor_allele_fieldwise():
    G = np.array([[0, 1, 2, 3, 0, 2, 1, 3]], dtype=np.uint8)
    pk = pack_2bit_rows(G)
    flipped = unpack_2bit_rows(bed.flip_packed_minor_allele(pk), 8)
    np.testing.assert_array_equal(flipped, [[2, 1, 0, 3, 2, 0, 1, 3]])


def test_read_bed_packed_matches_dense_path_demo():
    packed, N, M = bed.read_bed_packed(DEMO_BED)
    G = SNPReader().read_data(DEMO_BED)
    assert (N, M) == G.shape
    np.testing.assert_array_equal(unpack_2bit_rows(packed, M), G)
    # padding columns are genotype 0
    m_pad = packed.shape[1] * 4
    pad = unpack_2bit_rows(packed, m_pad)[:, M:]
    np.testing.assert_array_equal(pad, 0)


def test_read_bed_packed_applies_flip(tmp_path):
    # mean >= 1 -> flip; missing stays 3; padding stays 0
    rng = np.random.default_rng(0)
    G = rng.choice([1, 2, 3], size=(10, 37), p=[0.3, 0.6, 0.1]).astype(np.uint8)
    G[0, 0] = 0  # keep validation happy (min == 0)
    path = _write_bed(tmp_path, G)
    packed, N, M = bed.read_bed_packed(path)
    expected = SNPReader().read_data(path)
    np.testing.assert_array_equal(unpack_2bit_rows(packed, M), expected)
    m_pad = packed.shape[1] * 4
    np.testing.assert_array_equal(unpack_2bit_rows(packed, m_pad)[:, M:], 0)


def test_fam_trailing_blank_line_not_a_sample(tmp_path):
    """A .fam ending with a blank line must not add a phantom sample
    decoded from BED padding bits (padding code 0b00 = dosage 2 would
    silently skew every allele frequency; the payload-size check cannot
    catch it when ceil(N/4) is unchanged)."""
    G = np.random.default_rng(7).integers(0, 3, size=(7, 40)).astype(np.uint8)
    G[0, 0] = 0
    path = _write_bed(tmp_path, G)
    with open(tmp_path / "t.fam", "a") as f:
        f.write("\n")  # trailing blank line
    assert bed.read_bed_dims(path) == (7, 40)
    packed, N, M = bed.read_bed_packed(path)
    assert (N, M) == (7, 40)


def test_read_bed_packed_block_streamed_exact(tmp_path):
    """SNP-block streaming (any block size, incl. non-aligned tails) must be
    bit-identical to a single-block ingest."""
    rng = np.random.default_rng(2)
    G = rng.integers(0, 4, size=(21, 1033), dtype=np.uint8)
    G[0, 0] = 0
    path = _write_bed(tmp_path, G)
    ref, N, M = bed.read_bed_packed(path, block_m=1 << 30)
    for blk in (4, 20, 1000):
        got, n2, m2 = bed.read_bed_packed(path, block_m=blk)
        assert (n2, m2) == (N, M)
        np.testing.assert_array_equal(got, ref)


def test_read_bed_packed_memory_is_block_bounded(tmp_path):
    """Single-process BED ingest must NOT hold the whole .bed byte matrix
    (or a dense decode) in RAM: peak allocations during read_bed_packed
    stay within the packed output plus O(block) temporaries (VERDICT r3
    item 6). Shape chosen so the old whole-file np.fromfile (+ full dense
    fallback decode) would blow the bound by several x."""
    import tracemalloc

    rng = np.random.default_rng(3)
    N, M = 64, 65536  # .bed bytes = 1 MiB; dense would be 4 MiB
    G = rng.integers(0, 3, size=(N, M), dtype=np.uint8)
    path = _write_bed(tmp_path, G)
    packed_bytes = N * (((M + 2047) // 2048) * 2048 // 4)
    block_m = 2048
    block_bytes = N * block_m + block_m * ((N + 3) // 4) + N * block_m // 4
    tracemalloc.start()
    tracemalloc.reset_peak()
    base, _ = tracemalloc.get_traced_memory()
    packed, _, _ = bed.read_bed_packed(path, block_m=block_m)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # Allowance: packed output + a few in-flight block temporaries + the
    # bounded histogram buffers of bed_code_counts (~1 MiB here). The old
    # whole-file ingest (full .bed bytes + a full dense decode in the NumPy
    # fallback) needs >= 6 MiB at this shape and must fail this bound.
    bound = packed_bytes + 4 * block_bytes + (1 << 21)
    assert peak - base < bound, (
        f"peak {peak - base} vs bound {bound} "
        f"(packed {packed_bytes}, block {block_bytes})")
    np.testing.assert_array_equal(
        unpack_2bit_rows(packed, M), SNPReader().read_data(path))


def test_loglikelihood_packed_matches_dense():
    rng = np.random.default_rng(1)
    N, M, K = 30, 77, 4
    G = rng.integers(0, 4, size=(N, M)).astype(np.uint8)
    packed = pack_2bit_rows(G, m_pad=128)
    P = rng.uniform(0.05, 0.95, size=(M, K))
    Q = rng.dirichlet(np.ones(K), size=N)
    dense = loglikelihood(G, P, Q, K)
    from_packed = loglikelihood_packed(packed, M, P, Q, block=7)
    np.testing.assert_allclose(from_packed, dense, rtol=1e-12)


def test_supervised_init_packed_matches_dense():
    rng = np.random.default_rng(2)
    N, M, K = 41, 53, 3
    G = rng.integers(0, 4, size=(N, M)).astype(np.uint8)
    y = rng.integers(0, K, size=N)
    packed = pack_2bit_rows(G, m_pad=64)
    dense = init_p_supervised(G, y, K)
    from_packed = init_p_supervised_packed(packed, y, K, M, block=8)
    np.testing.assert_allclose(from_packed, dense, rtol=1e-6)
