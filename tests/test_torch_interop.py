"""Reference .pt checkpoint interop: reference-trained models run under our
infer (drop-in), and our exports load back losslessly.

The reference saves a decoder-stripped torch state dict
(/root/reference/neural_admixture/src/main.py:40-43) and reloads it at
inference (/root/reference/neural_admixture/src/inference.py:54-57).
"""
import json

import jax.numpy as jnp
import numpy as np
import torch

from neural_admixture_tpu.entry import main
from neural_admixture_tpu.io.snp_reader import SNPReader
from neural_admixture_tpu.io.torch_interop import (
    load_pt_checkpoint, params_from_torch_state_dict, save_pt_checkpoint,
    torch_state_dict_from_params)
from neural_admixture_tpu.models import qp
from tests.conftest import DEMO_BED


def _reference_style_state_dict(M, D, H, ks, seed=0):
    """A state dict with exactly the keys/shapes the reference persists."""
    g = torch.Generator().manual_seed(seed)
    sd = {
        "V": torch.randn(M, D, generator=g),
        "batch_norm.weight": torch.rand(D, generator=g) + 0.5,
        "common_encoder.0.weight": torch.randn(H, D, generator=g) * 0.1,
        "common_encoder.0.bias": torch.randn(H, generator=g) * 0.1,
    }
    for i, k in enumerate(sorted(ks)):
        sd[f"multihead_encoder.heads.{i}.weight"] = (
            torch.randn(k, H, generator=g) * 0.1)
        sd[f"multihead_encoder.heads.{i}.bias"] = (
            torch.randn(k, generator=g) * 0.1)
    return sd


def _torch_encoder_forward(sd, X_np, ks):
    """Independent torch re-computation of the reference's inference forward
    (model/neural_admixture.py:157-177, encoder-only return path)."""
    X = torch.tensor(X_np)
    Xp = X @ sd["V"]
    h = torch.nn.functional.rms_norm(Xp, (Xp.shape[-1],),
                                     weight=sd["batch_norm.weight"], eps=1e-8)
    e = torch.relu(h @ sd["common_encoder.0.weight"].T
                   + sd["common_encoder.0.bias"])
    out = {}
    for i, k in enumerate(sorted(ks)):
        logits = (e @ sd[f"multihead_encoder.heads.{i}.weight"].T
                  + sd[f"multihead_encoder.heads.{i}.bias"])
        out[f"k{k}"] = torch.softmax(logits, dim=1)
    return out


def test_imported_state_dict_matches_torch_forward():
    ks = [3, 5]
    sd = _reference_style_state_dict(M=40, D=4, H=16, ks=ks)
    params = params_from_torch_state_dict(sd, ks)

    rng = np.random.default_rng(1)
    X = (rng.integers(0, 3, size=(6, 40)) / 2.0).astype(np.float32)
    qs = qp.forward_infer(params, jnp.asarray(X))
    t_qs = _torch_encoder_forward(sd, X, ks)
    for hk in qs:
        np.testing.assert_allclose(np.asarray(qs[hk]), t_qs[hk].numpy(),
                                   rtol=2e-4, atol=2e-6)


def test_export_import_round_trip_drops_padding(tmp_path):
    """Export unpads V to the true M; re-import reproduces the unpadded tree."""
    import jax

    ks = [2, 4]
    M, D, H = 37, 4, 8
    rng = np.random.default_rng(0)
    V = rng.normal(size=(M, D)).astype(np.float32)
    P = rng.uniform(0.1, 0.9, size=(sum(ks), M)).astype(np.float32)
    params = qp.init_params(jax.random.PRNGKey(0), V, P, H, ks, m_pad=64)
    assert params["V"].shape[0] == 64  # padded

    save_pt_checkpoint(params, "rt", str(tmp_path), num_snps=M)
    back = load_pt_checkpoint("rt", str(tmp_path), ks)

    np.testing.assert_array_equal(back["V"], np.asarray(params["V"])[:M])
    np.testing.assert_array_equal(back["rmsnorm"]["weight"],
                                  np.asarray(params["rmsnorm"]["weight"]))
    np.testing.assert_array_equal(back["common"]["kernel"],
                                  np.asarray(params["common"]["kernel"]))
    for hk in ("k2", "k4"):
        np.testing.assert_array_equal(
            back["heads"][hk]["kernel"],
            np.asarray(params["heads"][hk]["kernel"]))
        np.testing.assert_array_equal(
            back["heads"][hk]["bias"], np.asarray(params["heads"][hk]["bias"]))


def test_ks_mismatch_raises():
    sd = _reference_style_state_dict(M=10, D=2, H=4, ks=[3])
    try:
        params_from_torch_state_dict(sd, [5])
    except ValueError as e:
        assert "disagree" in str(e)
    else:
        raise AssertionError("mismatched ks must raise")


def test_infer_cli_runs_reference_pt_checkpoint(tmp_path):
    """End-to-end drop-in: only {name}.pt + the reference's config keys on
    disk (no .npz, no num_snps), inferred Q matches the dense-path encoder."""
    G = SNPReader().read_data(DEMO_BED)
    N, M = G.shape
    ks, D, H = [3], 8, 32
    sd = _reference_style_state_dict(M=M, D=D, H=H, ks=ks, seed=7)
    torch.save(sd, tmp_path / "ref_run.pt")
    with open(tmp_path / "ref_run_config.json", "w") as f:
        json.dump({"ks": ks, "num_features": D, "hidden_size": H,
                   "activation": "relu"}, f)

    rc = main(["infer", "--name", "ref_run", "--save_dir", str(tmp_path),
               "--data_path", DEMO_BED, "--out_name", "proj",
               "--threads", "2"])
    assert rc == 0

    Q = np.loadtxt(tmp_path / "proj.3.Q")
    X = G.astype(np.float32) / 2.0
    X[G == 3] = 0.0
    params = params_from_torch_state_dict(sd, ks)
    Q_direct = np.asarray(qp.forward_infer(params, jnp.asarray(X))["k3"])
    np.testing.assert_allclose(Q, Q_direct, atol=1e-4, rtol=1e-3)
