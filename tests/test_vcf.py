import gzip

import numpy as np
import pytest

from neural_admixture_tpu.io.snp_reader import SNPReader
from neural_admixture_tpu.io.vcf import read_vcf

VCF_TEXT = """##fileformat=VCFv4.2
##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3
1\t100\trs1\tA\tG\t50\tPASS\t.\tGT:DP\t0/0:10\t0/1:12\t1/1:9
1\t200\trs2\tC\tT\t50\tPASS\t.\tGT\t0|1\t1|1\t0|0
1\t300\trs3\tG\tA\t50\tPASS\t.\tGT\t./.\t0/0\t1/0
"""

EXPECTED = np.array([
    [0, 1, 3],   # S1: 0/0, 0|1, ./.
    [1, 2, 0],   # S2
    [2, 0, 1],   # S3
], dtype=np.uint8)


def test_read_vcf_plain(tmp_path):
    p = tmp_path / "t.vcf"
    p.write_text(VCF_TEXT)
    G = read_vcf(str(p))
    np.testing.assert_array_equal(G, EXPECTED)


def test_read_vcf_gz(tmp_path):
    p = tmp_path / "t.vcf.gz"
    with gzip.open(p, "wt") as f:
        f.write(VCF_TEXT)
    G = read_vcf(str(p))
    np.testing.assert_array_equal(G, EXPECTED)


def test_snp_reader_vcf_dispatch_and_flip(tmp_path):
    p = tmp_path / "t.vcf"
    p.write_text(VCF_TEXT)
    out = SNPReader().read_data(str(p))
    # matrix mean of EXPECTED is 10/9 >= 1 -> minor-allele flip, missing kept
    flipped = (2 - EXPECTED.astype(np.int16)).astype(np.uint8)
    flipped[EXPECTED == 3] = 3
    np.testing.assert_array_equal(out, flipped)


def test_read_vcf_rejects_headerless(tmp_path):
    p = tmp_path / "bad.vcf"
    p.write_text("1\t100\trs1\tA\tG\t50\tPASS\t.\tGT\t0/0\n")
    with pytest.raises(ValueError):
        read_vcf(str(p))


def test_read_vcf_packed_matches_dense(tmp_path):
    """Streaming VCF->packed must equal the dense read + flip + pack,
    including the minor-allele flip decided from global counts and a
    block-boundary case (monkeypatched tiny pack block)."""
    from neural_admixture_tpu.io import vcf as vcf_mod
    from neural_admixture_tpu.io.packed import pack_with_padding
    from neural_admixture_tpu.io.vcf import read_vcf_packed

    rng = np.random.default_rng(0)
    n, m = 7, 19
    G = rng.integers(0, 3, size=(n, m)).astype(np.uint8)
    G[0, 3] = 3  # one missing genotype
    header = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + \
        "\t".join(f"S{i}" for i in range(n))
    lines = ["##fileformat=VCFv4.2", header]
    code = {0: "0/0", 1: "0/1", 2: "1/1", 3: "./."}
    for v in range(m):
        lines.append(f"1\t{v}\trs{v}\tA\tG\t50\tPASS\t.\tGT\t"
                     + "\t".join(code[int(G[s, v])] for s in range(n)))
    p = tmp_path / "t.vcf"
    p.write_text("\n".join(lines) + "\n")

    # Dense reference path: read + same flip rule + pack.
    dense = read_vcf(str(p))
    counts = np.bincount(dense.ravel(), minlength=4)
    if (counts * np.arange(4)).sum() / counts.sum() >= 1:
        flip = (2 - dense.astype(np.int16)).astype(np.uint8)
        flip[dense == 3] = 3
        dense = flip
    want, _ = pack_with_padding(dense)

    old = vcf_mod._PACK_BLOCK
    vcf_mod._PACK_BLOCK = 8  # force multiple flush boundaries
    try:
        packed, N, M = read_vcf_packed(str(p))
    finally:
        vcf_mod._PACK_BLOCK = old
    assert (N, M) == (n, m)
    np.testing.assert_array_equal(packed, want)


def test_read_vcf_packed_rejects_multiallelic(tmp_path):
    text = VCF_TEXT + "1\t400\trs4\tT\tC\t50\tPASS\t.\tGT\t2/2\t0/0\t0/0\n"
    p = tmp_path / "multi.vcf"
    p.write_text(text)
    from neural_admixture_tpu.io.vcf import read_vcf_packed
    with pytest.raises(AssertionError, match="biallelic"):
        read_vcf_packed(str(p))


def test_cli_train_vcf_packed_path(tmp_path):
    """`train` on a VCF goes through the streaming packed reader (run.py
    packed_native branch) end to end."""
    from neural_admixture_tpu.entry import main

    rng = np.random.default_rng(1)
    n, m = 24, 40
    G = rng.integers(0, 3, size=(n, m)).astype(np.uint8)
    header = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + \
        "\t".join(f"S{i}" for i in range(n))
    lines = ["##fileformat=VCFv4.2", header]
    code = {0: "0/0", 1: "0/1", 2: "1/1"}
    for v in range(m):
        lines.append(f"1\t{v}\trs{v}\tA\tG\t50\tPASS\t.\tGT\t"
                     + "\t".join(code[int(G[s, v])] for s in range(n)))
    p = tmp_path / "train.vcf"
    p.write_text("\n".join(lines) + "\n")
    rc = main(["train", "--k", "2", "--data_path", str(p),
               "--save_dir", str(tmp_path), "--name", "v", "--epochs", "1",
               "--batch_size", "16", "--hidden_size", "16",
               "--n_components", "4", "--mesh", "1x1", "--no_progress"])
    assert rc == 0
    Q = np.loadtxt(tmp_path / "v.2.Q")
    assert Q.shape == (n, 2)
    np.testing.assert_allclose(Q.sum(axis=1), 1.0, rtol=1e-4)


def test_read_vcf_crlf_missing_last_column(tmp_path):
    """CRLF line endings: the last sample column keeps '\r' unless the
    reader strips it -- a missing genotype './.' there must still map to
    3 instead of raising (ADVICE r3). Covers both the dense and the
    streaming packed readers."""
    from neural_admixture_tpu.io.packed import unpack_2bit_rows
    from neural_admixture_tpu.io.vcf import read_vcf_packed

    p = tmp_path / "crlf.vcf"
    p.write_bytes(VCF_TEXT.replace("\n", "\r\n").encode())
    G = read_vcf(str(p))
    np.testing.assert_array_equal(G, EXPECTED)

    packed, n, m = read_vcf_packed(str(p))
    assert (n, m) == EXPECTED.shape
    # mean >= 1 -> the packed reader applies the minor-allele flip
    flipped = (2 - EXPECTED.astype(np.int16)).astype(np.uint8)
    flipped[EXPECTED == 3] = 3
    np.testing.assert_array_equal(unpack_2bit_rows(packed, m), flipped)


def _write_vcf(path, G):
    n, m = G.shape
    header = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + \
        "\t".join(f"S{i}" for i in range(n))
    lines = ["##fileformat=VCFv4.2", header]
    code = {0: "0/0", 1: "0/1", 2: "1/1", 3: "./."}
    for v in range(m):
        lines.append(f"1\t{v}\trs{v}\tA\tG\t50\tPASS\t.\tGT\t"
                     + "\t".join(code[int(G[s, v])] for s in range(n)))
    path.write_text("\n".join(lines) + "\n")


def test_vcf_dims_and_packed_rows(tmp_path):
    """The multi-host column-slice read equals the full read's row slice
    (pre-flip), and the local code counts cover exactly those rows --
    the same contract as read_bed_packed_rows / read_pgen_packed_rows."""
    from neural_admixture_tpu.io import vcf as vcf_mod
    from neural_admixture_tpu.io.packed import pack_with_padding
    from neural_admixture_tpu.io.vcf import read_vcf_packed_rows, vcf_dims

    rng = np.random.default_rng(4)
    n, m = 23, 170
    G = rng.integers(0, 3, size=(n, m)).astype(np.uint8)
    G[rng.uniform(size=G.shape) < 0.04] = 3
    p = tmp_path / "rows.vcf"
    _write_vcf(p, G)

    assert vcf_dims(str(p)) == (n, m)
    old = vcf_mod._PACK_BLOCK
    vcf_mod._PACK_BLOCK = 16  # multiple flush boundaries
    try:
        start, end = 7, 18
        packed_rows, counts = read_vcf_packed_rows(str(p), start, end)
        empty, empty_counts = read_vcf_packed_rows(str(p), n, n)
    finally:
        vcf_mod._PACK_BLOCK = old
    expected, _ = pack_with_padding(G[start:end])
    np.testing.assert_array_equal(packed_rows, expected)
    np.testing.assert_array_equal(
        counts, np.bincount(G[start:end].ravel(), minlength=4))
    # an all-padding tail host reads an empty block cleanly
    assert empty.shape[0] == 0 and empty_counts.sum() == 0
