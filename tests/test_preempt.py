"""Preemption-safe checkpointing: SIGTERM during training saves a resumable
checkpoint at the next epoch boundary and exits 143; a --resume restart
continues from it (the engine's resume is bit-exact, tests/
test_checkpoint_resume.py). Spawns the REAL CLI as a subprocess, like a
preemptible scheduler would see it."""
import os
import signal
import subprocess
import sys
import time

import numpy as np

from tests.conftest import DEMO_BED

EPOCHS = 2000  # large so the signal always lands mid-training


def _cmd(out, resume=False):
    cmd = [sys.executable, "-u", "-m", "neural_admixture_tpu.entry", "train",
           "--k", "2", "--data_path", DEMO_BED, "--save_dir", str(out),
           "--name", "pre", "--epochs", str(EPOCHS), "--seed", "3",
           "--batch_size", "64", "--hidden_size", "32", "--no_progress",
           "--checkpoint_every", "5", "--mesh", "1x1"]
    return cmd + ["--resume"] if resume else cmd


def test_sigterm_checkpoints_and_resumes(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    ckpt = tmp_path / "pre_ckpt.npz"
    p = subprocess.Popen(_cmd(tmp_path), env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    # Wait for the first periodic checkpoint (epoch 5), then "preempt".
    deadline = time.time() + 300
    while not ckpt.exists() and time.time() < deadline:
        assert p.poll() is None, p.communicate()[0][-3000:]
        time.sleep(0.2)
    assert ckpt.exists(), "no periodic checkpoint appeared within 300s"
    p.send_signal(signal.SIGTERM)
    out = p.communicate(timeout=120)[0]
    assert p.returncode == 143, f"exit {p.returncode}:\n{out[-3000:]}"
    assert "SIGTERM received: resumable checkpoint saved" in out
    assert ckpt.exists()
    with np.load(ckpt) as d:
        stopped_at = int(d["epoch"])
    assert 0 < stopped_at < EPOCHS

    r = subprocess.run(_cmd(tmp_path, resume=True), env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-3000:]
    assert f"Resuming from epoch {stopped_at}" in r.stdout
    Q = np.loadtxt(tmp_path / "pre.2.Q")
    assert Q.shape == (105, 2)
    np.testing.assert_allclose(Q.sum(axis=1), 1.0, rtol=1e-4)
