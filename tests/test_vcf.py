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
