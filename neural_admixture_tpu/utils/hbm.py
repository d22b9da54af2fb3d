"""Per-chip HBM capacity heuristics shared by the out-of-core paths.

One source of truth for "does a host-resident array fit on the device":
the training engine's pre-flight estimate (train.engine.launch_training),
the RSVD driver (ops.rsvd), and the PCA projection (train.init) all budget
against the same NA_TPU_HBM_CAPACITY_GB capacity (default 16 GiB, a v5e).
"""
import os

# Fraction of capacity a phase may plan to occupy; the rest is headroom for
# allocator fragmentation and XLA scratch. Shared by every decision site so
# the phases agree on what "fits".
HBM_BUDGET_FRAC = 0.9


def hbm_capacity_bytes() -> float:
    """Per-chip HBM capacity.

    Priority: NA_TPU_HBM_CAPACITY_GB env override, then the runtime's own
    report (device.memory_stats()['bytes_limit'] -- available on colocated
    TPU hosts; the experimental axon tunnel returns None), then 16 GiB
    (a v5e chip)."""
    env = os.environ.get("NA_TPU_HBM_CAPACITY_GB")
    if env:
        try:
            gb = float(env)
        except ValueError:
            raise ValueError(
                f"NA_TPU_HBM_CAPACITY_GB must be a number of GiB, got "
                f"{env!r}") from None
        if gb <= 0:
            raise ValueError(
                f"NA_TPU_HBM_CAPACITY_GB must be > 0, got {env!r}")
        return gb * 2**30
    try:
        import jax
        dev = jax.devices()[0]
        if dev.platform == "tpu":
            stats = dev.memory_stats()
            if stats and stats.get("bytes_limit"):
                return float(stats["bytes_limit"])
    except Exception:
        pass
    return 16 * 2**30


def should_stream_host(nbytes: int, frac: float = HBM_BUDGET_FRAC) -> bool:
    """True when a device-resident footprint of ``nbytes`` (the host array
    plus the op's own transients -- callers include them) should stream from
    host instead: it would claim more than ``frac`` of per-chip capacity."""
    return nbytes > frac * hbm_capacity_bytes()
