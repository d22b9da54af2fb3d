"""PLINK BED genotype decoding.

The BED format stores genotypes SNP-major: after a 3-byte magic, each SNP
occupies ceil(N/4) bytes, 4 samples per byte, 2 bits per sample, with codes

    0b00 -> 2 (hom. first/A1 allele)   0b01 -> 3 (missing)
    0b10 -> 1 (het.)                   0b11 -> 0 (hom. second/A2 allele)

i.e. the dosage lookup table [2, 3, 1, 0] used by the reference decoder
(/root/reference/neural_admixture/src/snp_reader.py:16-45 and
/root/reference/neural_admixture/src/utils_c/utils.pyx:43-68).

Two decode paths:
  * a vectorized NumPy path (``decode_bed_numpy``) using a 256x4 lookup
    table -- this runs at memory bandwidth and is the portable fallback;
  * a native C++/OpenMP path (``neural_admixture_tpu.native``) that decodes
    BED bytes straight into the sample-major 2-bit packed layout used on
    device, never materializing the N x M uint8 matrix.
"""
from math import ceil
from pathlib import Path
from typing import Tuple

import numpy as np

# lut8[b] = 4 dosages encoded in byte b (sample order: low bits first)
_LUT4 = np.array([2, 3, 1, 0], dtype=np.uint8)
_LUT8 = np.zeros((256, 4), dtype=np.uint8)
for _b in range(256):
    for _j in range(4):
        _LUT8[_b, _j] = _LUT4[(_b >> (2 * _j)) & 3]


def read_bed_dims(file: str) -> Tuple[int, int]:
    """Return (N, M) for a BED fileset by counting .fam lines and sizing .bed."""
    file_path = Path(file)
    fam_file = file_path.with_suffix(".fam")
    bed_file = file_path.with_suffix(".bed")
    with open(fam_file, "r") as fam:
        N = sum(1 for _ in fam)
    n_bytes_per_snp = ceil(N / 4)
    total = bed_file.stat().st_size - 3
    if total % n_bytes_per_snp != 0:
        raise ValueError(f".bed payload size {total} is not a multiple of "
                         f"ceil(N/4)={n_bytes_per_snp}; .fam/.bed mismatch")
    return N, total // n_bytes_per_snp


def read_bed_bytes(file: str) -> Tuple[np.ndarray, int, int]:
    """Read the raw SNP-major byte matrix of shape (M, ceil(N/4))."""
    file_path = Path(file)
    bed_file = file_path.with_suffix(".bed")
    N, M = read_bed_dims(file)
    with open(bed_file, "rb") as bed:
        magic = bed.read(3)
        if magic[:2] != b"\x6c\x1b":
            raise ValueError(f"{bed_file} is not a PLINK BED file (bad magic)")
        if magic[2] != 1:
            raise ValueError("Only SNP-major (mode 1) BED files are supported")
        B = np.fromfile(bed, dtype=np.uint8)
    B = B.reshape(M, ceil(N / 4))
    return B, N, M


def decode_bed_numpy(B: np.ndarray, N: int) -> np.ndarray:
    """Decode SNP-major BED bytes (M, ceil(N/4)) to sample-major dosages (N, M)."""
    M = B.shape[0]
    # (M, Nb) bytes -> (M, Nb, 4) dosages -> (M, 4*Nb) -> crop -> transpose
    G = _LUT8[B].reshape(M, -1)[:, :N]
    return np.ascontiguousarray(G.T)


def read_bed(file: str) -> np.ndarray:
    """Read a BED fileset into a (N, M) uint8 dosage matrix (3 = missing).

    Prefers the native C++ decoder when built; falls back to NumPy.
    """
    B, N, M = read_bed_bytes(file)
    try:
        from ..native import bed_native
        if bed_native.available():
            return bed_native.decode_bed(B, N)
    except ImportError:
        pass
    return decode_bed_numpy(B, N)
