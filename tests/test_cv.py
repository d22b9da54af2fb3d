"""--cv k-fold cross-validation (train/cv.py) -- the reference's
commented-out capability, implemented for real."""
import numpy as np
import pytest

from neural_admixture_tpu.train.cv import kfold_indices


def test_kfold_matches_sklearn():
    """The split must reproduce sklearn KFold(shuffle=True, random_state)
    exactly -- the object the reference's dead code constructs
    (src/main.py:62)."""
    sklearn_ms = pytest.importorskip("sklearn.model_selection")
    for N, k, seed in ((23, 3, 0), (40, 5, 42), (11, 2, 7)):
        ours = kfold_indices(N, k, seed)
        ref = sklearn_ms.KFold(n_splits=k, shuffle=True, random_state=seed)
        for (tr, va), (tr_r, va_r) in zip(ours, ref.split(np.zeros(N))):
            np.testing.assert_array_equal(tr, np.sort(tr_r))
            np.testing.assert_array_equal(va, np.sort(va_r))
        # every sample validates exactly once
        all_val = np.concatenate([v for _, v in ours])
        assert sorted(all_val.tolist()) == list(range(N))


def test_cli_cv_end_to_end(tmp_path):
    """`train --cv 3 --min_k 2 --max_k 3` logs per-K CV errors and writes
    the csv, then still produces the normal full-data outputs."""
    from neural_admixture_tpu.entry import main as cli_main
    from tests.test_multihost import _write_synthetic_bed

    bed = tmp_path / "cv.bed"
    _write_synthetic_bed(bed, N=60, M=128, seed=5)
    out = str(tmp_path / "out")
    rc = cli_main(["train", "--min_k", "2", "--max_k", "3", "--cv", "3",
                   "--data_path", str(bed), "--save_dir", out, "--name",
                   "cvrun", "--epochs", "2", "--batch_size", "16",
                   "--hidden_size", "16", "--no_progress",
                   "--mesh", "1x1"])
    assert rc == 0
    rows = [ln.split(",") for ln in
            open(f"{out}/cvrun.cv_errors.csv").read().strip().splitlines()]
    assert rows[0] == ["K", "cv_error_mean", "cv_error_std"]
    assert [r[0] for r in rows[1:]] == ["2", "3"]
    for r in rows[1:]:
        assert np.isfinite(float(r[1])) and float(r[1]) > 0
        assert np.isfinite(float(r[2]))
    # the normal fit still ran and wrote its outputs
    assert np.genfromtxt(f"{out}/cvrun.2.Q").shape == (60, 2)
    assert np.genfromtxt(f"{out}/cvrun.3.Q").shape == (60, 3)
    # elbow plot (best-effort; matplotlib is present in CI)
    import importlib.util
    if importlib.util.find_spec("matplotlib"):
        import os
        assert os.path.exists(f"{out}/cvrun.cv_errors.png")


def test_cv_rejects_bad_folds(tmp_path):
    from neural_admixture_tpu.entry import main as cli_main
    from tests.test_multihost import _write_synthetic_bed
    bed = tmp_path / "cv.bed"
    _write_synthetic_bed(bed, N=20, M=64, seed=6)
    with pytest.raises(AssertionError, match="folds must be >= 2"):
        cli_main(["train", "--k", "2", "--cv", "1", "--data_path",
                  str(bed), "--save_dir", str(tmp_path / "o"), "--name",
                  "x", "--epochs", "1", "--no_progress"])
