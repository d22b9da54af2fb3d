"""End-to-end drop-in proof against the reference's torch ``.pt`` format.

io/torch_interop.py is unit-tested elsewhere; this file closes the loop
that would catch a silent head-ordering / V-padding / transpose bug in
the drop-in claim:

  A) a REFERENCE-architecture torch model (exact module tree, so the
     state-dict keys match /root/reference/neural_admixture/model/
     neural_admixture.py:127-144 byte-for-byte) is trained for a few
     epochs, saved exactly as the reference does (decoder-stripped
     state dict + ``{name}_config.json``, src/main.py:40-43 +
     neural_admixture.py:206-229), and our ``infer`` CLI must reproduce
     the replica's own encoder Q on the same data;
  B) the ``.pt`` exported by our training run must load into the
     replica module (no unexpected keys; only decoders missing) and the
     replica's forward must reproduce our saved ``.Q`` outputs.
"""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from neural_admixture_tpu.entry import main as cli_main  # noqa: E402
from neural_admixture_tpu.io.pgen import write_pgen_mode2  # noqa: E402


class _RefEncoder(torch.nn.Module):
    # neural_admixture.py:27-29: one Linear(H, k) per K, ascending
    def __init__(self, hidden, ks):
        super().__init__()
        self.heads = torch.nn.ModuleList(
            [torch.nn.Linear(hidden, k, bias=True) for k in sorted(ks)])

    def forward(self, x):
        return [head(x) for head in self.heads]


class _RefDecoder(torch.nn.Module):
    # neural_admixture.py:69-76: Linear(k, M, bias=False) per K
    def __init__(self, M, ks):
        super().__init__()
        self.decoders = torch.nn.ModuleList(
            [torch.nn.Linear(k, M, bias=False) for k in sorted(ks)])


class _RefReplica(torch.nn.Module):
    """Faithful module tree of the reference model so ``state_dict()``
    keys match: V, batch_norm.*, common_encoder.0.*,
    multihead_encoder.heads.{i}.*, decoders.decoders.{i}.weight
    (neural_admixture.py:127-144)."""

    def __init__(self, M, D, hidden, ks, seed=0):
        super().__init__()
        torch.manual_seed(seed)
        self.V = torch.nn.Parameter(torch.randn(M, D) * 0.05)
        self.batch_norm = torch.nn.RMSNorm(D, eps=1e-8)
        self.common_encoder = torch.nn.Sequential(
            torch.nn.Linear(D, hidden, bias=True),
            torch.nn.ReLU(inplace=True))
        self.multihead_encoder = _RefEncoder(hidden, ks)
        self.decoders = _RefDecoder(M, ks)
        self.ks = sorted(ks)

    def q(self, X):
        # neural_admixture.py:157-177: X @ V -> RMSNorm -> shared MLP ->
        # per-K head -> softmax
        h = self.common_encoder(self.batch_norm(X @ self.V))
        return [torch.softmax(out, dim=1)
                for out in self.multihead_encoder(h)]

    def train_steps(self, X, epochs=5, batch=16, lr=2e-3, seed=1):
        opt = torch.optim.Adam(self.parameters(), lr=lr, betas=(0.9, 0.95))
        lossf = torch.nn.BCELoss(reduction="sum")
        gen = torch.Generator().manual_seed(seed)
        for _ in range(epochs):
            order = torch.randperm(X.shape[0], generator=gen)
            for i in range(0, X.shape[0], batch):
                xb = X[order[i:i + batch]]
                opt.zero_grad(set_to_none=True)
                loss = 0
                for qi, dec in zip(self.q(xb), self.decoders.decoders):
                    loss = loss + lossf(torch.clamp(dec(qi), 0, 1), xb)
                loss.backward()
                opt.step()


def _data(N=48, M=300, seed=11):
    rng = np.random.default_rng(seed)
    G = rng.choice([0, 1, 2], p=[0.62, 0.28, 0.10], size=(N, M)) \
        .astype(np.uint8)
    G[rng.uniform(size=G.shape) < 0.03] = 3
    G[0, 0], G[1, 1] = 0, 2
    return G


def _x_of(G):
    X = G.astype(np.float32) / 2.0
    X[G == 3] = 0.0  # neural_admixture.py:169-170
    return torch.from_numpy(X)


def test_reference_pt_runs_through_infer(tmp_path):
    """Direction A: a reference-trained (replica) .pt + config drives our
    ``infer`` CLI; Q must match the replica's own encoder forward. Multi-
    head, so any head-ordering or kernel-transpose drift explodes."""
    G = _data()
    N, M = G.shape
    D, H, ks = 6, 16, [2, 3, 4]
    model = _RefReplica(M, D, H, ks, seed=3)
    model.train_steps(_x_of(G), epochs=5)

    save_dir = tmp_path / "ref_model"
    save_dir.mkdir()
    # exactly the reference's save: src/main.py:40-43
    sd = {k: v for k, v in model.state_dict().items()
          if not k.startswith("decoders")}
    torch.save(sd, save_dir / "refrun.pt")
    # exactly the reference's config: neural_admixture.py:206-229 (note:
    # no num_snps -- that is this package's extension key)
    with open(save_dir / "refrun_config.json", "w") as fh:
        json.dump({"ks": ks, "num_features": D, "hidden_size": H,
                   "activation": "relu"}, fh)

    data_path = str(tmp_path / "data.pgen")
    write_pgen_mode2(data_path, G)
    rc = cli_main(["infer", "--name", "refrun", "--out_name", "proj",
                   "--save_dir", str(save_dir), "--data_path", data_path,
                   "--num_gpus", "0"])
    assert rc == 0

    with torch.no_grad():
        expected = [qk.numpy() for qk in model.q(_x_of(G))]
    for k, exp in zip(ks, expected):
        got = np.loadtxt(save_dir / f"proj.{k}.Q")
        assert got.shape == (N, k)
        # same weights, same math: agreement far beyond any column
        # permutation / transpose bug could survive
        np.testing.assert_allclose(got, exp, atol=2e-4)


def test_our_pt_loads_into_reference_module(tmp_path):
    """Direction B: the .pt exported by our training loads into the
    replica (no unexpected keys, only decoders missing) and the replica's
    forward reproduces our saved .Q outputs."""
    G = _data(seed=12)
    N, M = G.shape
    data_path = str(tmp_path / "data.pgen")
    write_pgen_mode2(data_path, G)
    out = tmp_path / "out"
    rc = cli_main(["train", "--min_k", "2", "--max_k", "4", "--data_path",
                   data_path, "--save_dir", str(out), "--name", "ours",
                   "--epochs", "4", "--batch_size", "16", "--hidden_size",
                   "16", "--n_components", "6", "--seed", "7",
                   "--no_progress"])
    assert rc == 0
    assert (out / "ours.pt").exists()

    sd = torch.load(out / "ours.pt", map_location="cpu", weights_only=True)
    model = _RefReplica(M, 6, 16, [2, 3, 4], seed=9)
    result = model.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    assert all(k.startswith("decoders") for k in result.missing_keys), \
        result.missing_keys

    with torch.no_grad():
        qs = [qk.numpy() for qk in model.q(_x_of(G))]
    for k, q_torch in zip([2, 3, 4], qs):
        ours = np.loadtxt(out / f"ours.{k}.Q")
        assert ours.shape == (N, k)
        np.testing.assert_allclose(ours, q_torch, atol=2e-4)
