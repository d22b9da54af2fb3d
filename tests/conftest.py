"""Test env: run JAX on CPU with 8 virtual devices so sharding tests can
exercise a (data, snp) mesh without TPU hardware (SURVEY.md section 4)."""
import os

# Force CPU even when the ambient env selects the TPU platform: the test
# suite must be runnable anywhere, and sharding tests need 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Some pytest plugins import jax before this conftest runs, freezing the
# platform choice from the ambient env; override the config directly (the
# backend itself is not initialized until first use, so this still applies).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Demo fixtures vendored from the reference's demo/ data set (identical
# bytes; the repo is self-contained without the reference checkout).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO_BED = os.path.join(_REPO, "demo/data/demo_data.bed")
DEMO_Q_EXPECTED = os.path.join(_REPO, "demo/expected/demo_run.7.Q.expected")
DEMO_P_EXPECTED = os.path.join(_REPO, "demo/expected/demo_run.7.P.expected")


def assert_trajectory_close(got, want, lr, rtol=5e-3, atol=5e-4,
                            outlier_frac=0.005):
    """Cross-PROGRAM training-trajectory comparison robust to Adam sign
    flips.

    Two different compiled programs (mesh vs single device, grouped vs
    split kernels, ...) produce reduction-order-ulp gradient differences,
    and Adam's normalized step maps any NEAR-ZERO gradient to +-lr
    regardless of ulp size -- a tiny fraction of elements can
    legitimately drift a few lr over a short run (mechanics measured in
    PARITY round-5's supervised-coverage note; observed ~1/100s of runs
    in the driver dryrun before it gained the same gate). Every element
    must stay within a few-sign-flips absolute bound (10 * lr) and at
    most ``outlier_frac`` may exceed the tight accumulation-level
    tolerance; a real structural bug moves whole tensors by O(0.1-1),
    far outside both."""
    import numpy as np
    got, want = np.asarray(got), np.asarray(want)
    d = np.abs(got - want)
    loose = 10 * lr
    assert d.max() <= loose, f"max|d|={d.max():.3e} > {loose:.1e}"
    frac = (d > (rtol * np.abs(want) + atol)).mean()
    assert frac <= outlier_frac, \
        f"{frac:.2%} of elements outside rtol {rtol} (max|d|={d.max():.3e})"
