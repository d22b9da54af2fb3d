"""Two-process distributed training must reproduce the single-process run.

Spawns two REAL processes running the production CLI, rendezvousing through
jax.distributed (gloo collectives on CPU, one device per process -> a (2, 1)
mesh). Each process reads only its BED row block (io.bed.read_bed_packed_rows
via parallel.distributed.host_sample_shard), the engine assembles the global
resident array with jax.make_array_from_process_local_data, and only rank 0
writes outputs. This is the working analogue of the reference's multi-GPU
mp.spawn path (/root/reference/neural_admixture/entry.py:188-193) -- but
multi-HOST, which the reference cannot do.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import DEMO_BED

# 6 epochs > log_every (5) so the grouped log-period dispatch (one jit
# per period, engine.make_epoch_fn(epochs_per_call)) runs under the real
# two-process mesh: epoch 0-4 grouped, epoch 5 logged single.
EPOCHS, K, BATCH, HIDDEN, SEED = 6, 2, 64, 32, 7


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _cli(out_dir, name):
    return [sys.executable, "-m", "neural_admixture_tpu.entry", "train",
            "--k", str(K), "--data_path", DEMO_BED, "--save_dir",
            str(out_dir), "--name", name, "--epochs", str(EPOCHS),
            "--seed", str(SEED), "--batch_size", str(BATCH),
            "--hidden_size", str(HIDDEN), "--no_progress",
            # multi-process falls back to per-row sampling; the
            # single-process reference must sample the same way
            "--sample_block", "1"]


def _env(extra):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"  # 1 CPU device per process
    env.update(extra)
    return env


def test_two_process_training_matches_single_process(tmp_path):
    single, multi = tmp_path / "single", tmp_path / "multi"
    coord = f"127.0.0.1:{_free_port()}"

    procs = [subprocess.Popen(
        _cli(multi, "mh"), env=_env({
            "NA_TPU_COORDINATOR": coord,
            "NA_TPU_NUM_PROCESSES": "2",
            "NA_TPU_PROCESS_ID": str(pid),
        }), stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (1, 0)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out[-3000:]}"

    # Per-host row blocks and master-only writes must both have happened.
    rank0_log = outs[1]
    assert "this one holds rows [53, 105)" in outs[0], outs[0][-2000:]
    assert "this one holds rows [0, 53)" in rank0_log, rank0_log[-2000:]
    assert (multi / "mh.2.Q").exists()

    ref = subprocess.run(_cli(single, "sp"), env=_env({}), timeout=420,
                         capture_output=True, text=True)
    assert ref.returncode == 0, ref.stdout[-3000:] + ref.stderr[-2000:]

    Q1 = np.loadtxt(single / f"sp.{K}.Q")
    Q2 = np.loadtxt(multi / f"mh.{K}.Q")
    P1 = np.loadtxt(single / f"sp.{K}.P")
    P2 = np.loadtxt(multi / f"mh.{K}.P")
    np.testing.assert_allclose(Q2, Q1, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(P2, P1, rtol=5e-3, atol=5e-4)
