import numpy as np

from neural_admixture_tpu.utils.metrics import fst_table, hudsons_fst


def test_hudsons_fst_formula():
    p1 = np.array([0.1, 0.9, 0.5])
    p2 = np.array([0.2, 0.7, 0.5])
    num = np.mean((p1 - p2) ** 2)
    den = np.mean(p1 * (1 - p2) + p2 * (1 - p1)) + 1e-7
    np.testing.assert_allclose(hudsons_fst(p1, p2), num / den, rtol=1e-12)


def test_hudsons_fst_identical_pops_is_zero():
    p = np.array([0.3, 0.6])
    assert hudsons_fst(p, p) == 0.0


def test_fst_table_layout():
    rng = np.random.default_rng(0)
    P = rng.uniform(0.1, 0.9, size=(50, 4))
    lines = fst_table(P)
    # header + Pop0 line + 3 data rows (Pop1..Pop3)
    assert len(lines) == 5
    assert "Pop0\tPop1\tPop2" in lines[0]
    assert lines[-1].startswith("            Pop3")
    assert len(lines[-1].split("\t")) == 4  # Pop3 + 3 values
