"""Built-in VCF genotype reader (no external dependencies).

The reference delegates VCF parsing to scikit-allel
(/root/reference/neural_admixture/src/snp_reader.py:73-87) with semantics:
GT allele pair summed as int8, missing filled with -1 then mapped to 3,
result transposed to (samples, variants). This module reproduces those
semantics with a dependency-free parser (plain or gzip VCF); snp_reader
prefers scikit-allel when it is importable and falls back to this.
"""
import gzip
from typing import List

import numpy as np


def _open(path: str):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def _gt_dosage(sample_field: str) -> int:
    """GT subfield -> summed allele dosage, matching scikit-allel's semantics
    exactly (the reference's reader, snp_reader.py:82-87): each missing
    allele contributes -1 and only a NEGATIVE total maps to missing (3).
    Hence './.' -> 3 but './1' -> 0 -- faithful to the reference, quirks
    included."""
    gt = sample_field.split(":", 1)[0]
    total = 0
    for allele in gt.replace("|", "/").split("/"):
        total += -1 if allele in (".", "") else int(allele)
    if total < 0:
        return 3
    return min(total, 255)


def read_vcf(path: str) -> np.ndarray:
    """Parse a VCF into a (n_samples, n_variants) uint8 dosage matrix."""
    rows: List[List[int]] = []
    n_samples = None
    with _open(path) as f:
        for line in f:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                header = line.rstrip("\n").split("\t")
                if len(header) < 10:
                    raise ValueError("VCF has no sample columns")
                n_samples = len(header) - 9
                continue
            if not line.strip():
                continue
            if n_samples is None:
                raise ValueError("VCF data before #CHROM header")
            fields = line.rstrip("\n").split("\t")
            samples = fields[9:]
            if len(samples) != n_samples:
                raise ValueError(
                    f"VCF row has {len(samples)} samples, expected {n_samples}")
            rows.append([_gt_dosage(s) for s in samples])
    if n_samples is None:
        raise ValueError("Not a VCF file (no #CHROM header)")
    G = np.asarray(rows, dtype=np.uint8)  # (variants, samples)
    return np.ascontiguousarray(G.T)
