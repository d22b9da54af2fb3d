"""Per-chip HBM capacity heuristics shared by the out-of-core paths.

One source of truth for "does a host-resident array fit on the device":
the training engine's pre-flight estimate (train.engine.launch_training),
the RSVD driver (ops.rsvd), and the PCA projection (train.init) all budget
against the same NA_TPU_HBM_CAPACITY_GB capacity (default 16 GiB, a v5e).
"""
import os


def hbm_capacity_bytes() -> float:
    """Per-chip HBM capacity; override via NA_TPU_HBM_CAPACITY_GB."""
    return float(os.environ.get("NA_TPU_HBM_CAPACITY_GB", "16")) * 2**30


def should_stream_host(nbytes: int, frac: float = 0.85) -> bool:
    """True when a host array of ``nbytes`` should NOT be device-resident:
    it would claim more than ``frac`` of the per-chip capacity, leaving no
    room for the op's transients (GEMM sketches, unpack buffers)."""
    return nbytes > frac * hbm_capacity_bytes()
