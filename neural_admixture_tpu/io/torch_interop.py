"""Interop with the reference's torch ``.pt`` checkpoint format.

The reference saves its trained model as a torch state dict with the decoder
(P) weights stripped (/root/reference/neural_admixture/src/main.py:40-43) and
reloads it for projective inference
(/root/reference/neural_admixture/src/inference.py:54-57). A user migrating
from the reference has such ``.pt`` files on disk; this module maps them onto
this package's parameter pytree (and back), so ``infer`` runs reference-trained
models directly and reference tooling can consume models trained here.

Tensor layout differences (both directions are pure transposes/renames):

    reference state-dict key              shape      pytree entry        shape
    ------------------------------------  ---------  ------------------  ------
    V                                     (M, D)     V                   (M, D)
    batch_norm.weight                     (D,)       rmsnorm/weight      (D,)
    common_encoder.0.weight               (H, D)     common/kernel       (D, H)
    common_encoder.0.bias                 (H,)       common/bias         (H,)
    multihead_encoder.heads.{i}.weight    (k_i, H)   heads/k{K}/kernel   (H, k_i)
    multihead_encoder.heads.{i}.bias      (k_i,)     heads/k{K}/bias     (k_i,)

where ``i`` indexes ``sorted(ks)`` (the reference builds one head per K in
ascending order, /root/reference/neural_admixture/model/neural_admixture.py:27-29).
torch Linear stores (out, in) kernels; this package stores (in, out).
"""
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

_HEAD_FMT = "multihead_encoder.heads.{i}.{p}"


def params_from_torch_state_dict(sd: Dict, ks: List[int]) -> Dict:
    """Decoder-stripped reference state dict -> this package's pytree."""
    def arr(key):
        v = sd[key]
        # torch tensors expose .numpy(); plain arrays pass through.
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, dtype=np.float32)

    params = {
        "V": arr("V"),
        "rmsnorm": {"weight": arr("batch_norm.weight")},
        "common": {"kernel": arr("common_encoder.0.weight").T.copy(),
                   "bias": arr("common_encoder.0.bias")},
        "heads": {},
    }
    for i, k in enumerate(sorted(ks)):
        kernel = arr(_HEAD_FMT.format(i=i, p="weight")).T.copy()
        bias = arr(_HEAD_FMT.format(i=i, p="bias"))
        if kernel.shape[1] != k or bias.shape[0] != k:
            raise ValueError(
                f"Head {i} in the .pt file has K={kernel.shape[1]} but the "
                f"config lists ks[{i}]={k}; config and weights disagree.")
        params["heads"][f"k{k}"] = {"kernel": kernel, "bias": bias}
    return params


def torch_state_dict_from_params(params: Dict, num_snps: Optional[int] = None
                                 ) -> Dict:
    """Pytree -> reference-layout torch state dict (decoders stripped).

    ``num_snps``: the true (unpadded) SNP count; V's zero-padded rows beyond
    it are dropped so the exported model matches the reference's exact-M
    shapes.
    """
    import torch

    V = np.asarray(params["V"], dtype=np.float32)
    if num_snps is not None:
        V = V[:int(num_snps)]
    sd = {
        "V": torch.from_numpy(V.copy()),
        "batch_norm.weight": torch.from_numpy(
            np.asarray(params["rmsnorm"]["weight"], np.float32).copy()),
        "common_encoder.0.weight": torch.from_numpy(
            np.asarray(params["common"]["kernel"], np.float32).T.copy()),
        "common_encoder.0.bias": torch.from_numpy(
            np.asarray(params["common"]["bias"], np.float32).copy()),
    }
    def _k(hk):  # "k7" -> 7
        return int(hk[1:])
    for i, hk in enumerate(sorted(params["heads"], key=_k)):
        head = params["heads"][hk]
        sd[_HEAD_FMT.format(i=i, p="weight")] = torch.from_numpy(
            np.asarray(head["kernel"], np.float32).T.copy())
        sd[_HEAD_FMT.format(i=i, p="bias")] = torch.from_numpy(
            np.asarray(head["bias"], np.float32).copy())
    return sd


def load_pt_checkpoint(name: str, save_dir: str, ks: List[int]) -> Dict:
    """Load ``{save_dir}/{name}.pt`` (reference format) as a pytree."""
    import torch

    path = Path(save_dir) / f"{name}.pt"
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return params_from_torch_state_dict(sd, ks)


def save_pt_checkpoint(params: Dict, name: str, save_dir: str,
                       num_snps: Optional[int] = None) -> str:
    """Export ``{save_dir}/{name}.pt`` consumable by the reference's infer."""
    import torch

    Path(save_dir).mkdir(parents=True, exist_ok=True)
    sd = torch_state_dict_from_params(params, num_snps=num_snps)
    path = Path(save_dir) / f"{name}.pt"
    torch.save(sd, str(path))
    return str(path)
