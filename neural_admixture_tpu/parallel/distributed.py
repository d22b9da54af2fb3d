"""Multi-host initialization and host-sharded data loading.

The TPU runtime is SPMD: one Python process per host, each seeing its local
chips; there is no mp.spawn / NCCL rendezvous as in the reference
(/root/reference/neural_admixture/entry.py:188-193,
/root/reference/neural_admixture/src/utils.py:69-95). This module wires
``jax.distributed.initialize`` (env-driven on TPU pods; explicit
coordinator for manual bring-up) and computes each host's sample shard so
the input pipeline reads only local rows.

Single-host runs are unaffected: ``maybe_initialize_distributed`` is a no-op
unless a multi-process environment is detected or requested.
"""
import os
from typing import Optional, Tuple

import jax

from ..utils.logger import log, setup_logging


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True if distributed mode is active. Safe to call unconditionally:
    on a single host with no coordinator configured it does nothing.
    """
    setup_logging()
    env_coord = coordinator_address or os.environ.get("NA_TPU_COORDINATOR")
    env_nproc = num_processes if num_processes is not None else \
        int(os.environ.get("NA_TPU_NUM_PROCESSES", "0") or 0)
    auto_tpu_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES", "")) and \
        "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")

    if jax.process_count() > 1:
        return True
    if env_coord and env_nproc > 1:
        pid = process_id if process_id is not None else \
            int(os.environ.get("NA_TPU_PROCESS_ID", "0"))
        jax.distributed.initialize(coordinator_address=env_coord,
                                   num_processes=env_nproc, process_id=pid)
        log.info(f"    Distributed: process {pid}/{env_nproc} via {env_coord}")
        return True
    if auto_tpu_pod:
        # TPU pod slice: args are discovered from the TPU environment.
        jax.distributed.initialize()
        log.info(f"    Distributed: process {jax.process_index()}"
                 f"/{jax.process_count()} (TPU pod auto-config)")
        return True
    return False


def is_master() -> bool:
    return jax.process_index() == 0


def host_sample_shard(N: int) -> Tuple[int, int]:
    """[start, end) of this host's sample rows for the data-parallel axis.

    Rows are split contiguously and as evenly as possible across processes;
    each host's input pipeline should read only this slice (the reference
    instead loads the full matrix into every process's shared memory,
    entry.py:186 -- untenable at biobank scale).
    """
    p, n = jax.process_index(), jax.process_count()
    base, rem = divmod(N, n)
    start = p * base + min(p, rem)
    return start, start + base + (1 if p < rem else 0)
