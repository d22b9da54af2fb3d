"""Multi-format genotype reading with the reference's normalization semantics.

Mirrors /root/reference/neural_admixture/src/snp_reader.py:12-110:
  * dispatch on file suffix (.bed / .pgen / .vcf),
  * validate biallelic coding: min == 0 and max in (2, 3),
  * flip to minor-allele coding when the matrix-wide mean (missing included,
    as in the reference) is >= 1.

Deliberate deviation, documented: the reference flips with ``2 - G`` on uint8,
which underflows missing genotypes (3 -> 255) (/root/reference/neural_admixture/
src/snp_reader.py:110). We keep missing == 3 under the flip; on data without
missing genotypes the outputs are identical.
"""
import sys
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ..utils.logger import log, setup_logging
from .bed import read_bed


class SNPReader:
    """Reads genotype data from BED / PGEN / VCF into (N, M) uint8 dosages."""

    def _read_bed(self, file: str) -> np.ndarray:
        log.info("    Input format is BED.")
        return read_bed(file)

    def _read_pgen(self, file: str) -> np.ndarray:
        log.info("    Input format is PGEN.")
        # Block-streamed dosage read; works without pgenlib for fixed-width
        # storage modes (io.pgen). Same role as the reference's PGEN branch
        # (/root/reference/neural_admixture/src/snp_reader.py:47-71), which
        # instead materializes the full (M, 2N) allele-code matrix.
        from .pgen import read_pgen
        try:
            return read_pgen(file)
        except NotImplementedError as exc:
            log.error(f"    {exc}")
            sys.exit(1)

    def _read_vcf(self, file: str) -> np.ndarray:
        log.info("    Input format is VCF.")
        # Role of /root/reference/neural_admixture/src/snp_reader.py:73-87.
        try:
            import allel
        except ImportError:
            from .vcf import read_vcf  # built-in dependency-free parser
            return read_vcf(file)
        calls = allel.read_vcf(file, fields=["calldata/GT"],
                               fills={"calldata/GT": -1})["calldata/GT"]
        # Dosage = allele-code sum with missing alleles as -1; a negative
        # sum (fully missing call, or half-missing with a ref allele)
        # becomes 3. NOT to_n_alt: that would silently remap half-missing
        # ('./1' -> 3 instead of 0) and multiallelic codes ('2/2' -> 2,
        # evading the biallelic validation) away from the reference
        # semantics (snp_reader.py:84-86).
        dosage = calls.astype(np.int16).sum(axis=2)  # (M, N)
        dosage[dosage < 0] = 3
        return np.ascontiguousarray(dosage.T).astype(np.uint8)

    def read_data(self, file: str) -> np.ndarray:
        file_extensions = Path(file).suffixes
        if ".bed" in file_extensions:
            G = self._read_bed(file)
        elif ".pgen" in file_extensions:
            G = self._read_pgen(file)
        elif ".vcf" in file_extensions:
            G = self._read_vcf(file)
        else:
            log.error("    Invalid format. Unrecognized file format. Make sure "
                      "file ends with .bed, .pgen or .vcf .")
            sys.exit(1)
        assert int(G.min()) == 0 and int(G.max()) in (2, 3), \
            "Only biallelic SNPs are supported. Please make sure multiallelic sites have been removed."
        if G.mean() >= 1:
            missing = G == 3
            G = (2 - G.astype(np.int16)).astype(np.uint8)
            G[missing] = 3
        return G


def read_data(tr_file: str, tr_pops_f: Optional[str] = None
              ) -> Tuple[np.ndarray, Optional[List[str]], int, int]:
    """Read genotypes (+ optional per-sample population labels).

    Matches /root/reference/neural_admixture/src/utils.py:15-34.
    """
    setup_logging()
    data = SNPReader().read_data(tr_file)
    log.info(f"    Data contains {data.shape[0]} samples and {data.shape[1]} SNPs.")
    if tr_pops_f:
        log.info("    Population file provided!")
        with open(tr_pops_f, "r") as fb:
            pops = [p.strip() for p in fb.readlines()]
    else:
        pops = None
    return data, pops, data.shape[0], data.shape[1]
