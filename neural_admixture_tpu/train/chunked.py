"""Shared chunked-forward helper for full-data Q inference.

One implementation of the slice / zero-pad-last-block / forward / crop /
concatenate pattern used by the training engine's post-training Q pass and
by projective inference (the reference re-implements this via DataLoaders,
model/neural_admixture.py:368-383, src/inference.py:67-77).
"""
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def chunked_forward(fwd: Callable, data, N: int, batch: int,
                    sample_axis: int = 0, put: Callable = None
                    ) -> Dict[str, np.ndarray]:
    """Run ``fwd(batch_block) -> {head: (B, k)}`` over all N samples.

    ``data`` may be a device array or a host numpy array whose
    ``sample_axis`` dimension indexes samples (row-major packed rows, or
    tile-major (nT, N, words)). Host arrays are sliced on the host so only
    one batch lives on device at a time (projective inference may process
    matrices larger than device memory); ``put`` controls their placement
    (default jnp.asarray; a sharded caller passes a device_put into its
    batch sharding so host chunks land pre-sharded, not
    single-device-then-resharded). ``batch`` is used exactly as given
    (callers align it to their mesh); the last block is zero-padded to it
    and cropped after.
    """
    B = batch
    on_host = isinstance(data, np.ndarray)
    put = put if put is not None else jnp.asarray
    chunks: Dict[str, List[np.ndarray]] = {}
    for i in range(0, N, B):
        if on_host:
            index = [slice(None)] * data.ndim
            index[sample_axis] = slice(i, min(i + B, N))
            blk_np = data[tuple(index)]
            n_real = blk_np.shape[sample_axis]
            if n_real < B:  # pad on host, before placement
                pad_shape = list(blk_np.shape)
                pad_shape[sample_axis] = B - n_real
                blk_np = np.concatenate(
                    [blk_np, np.zeros(pad_shape, blk_np.dtype)],
                    axis=sample_axis)
            blk = put(blk_np)
        else:
            blk = jax.lax.slice_in_dim(data, i, min(i + B, N),
                                       axis=sample_axis)
            n_real = blk.shape[sample_axis]
            if n_real < B:
                pad_shape = list(blk.shape)
                pad_shape[sample_axis] = B - n_real
                blk = jnp.concatenate(
                    [blk, jnp.zeros(pad_shape, blk.dtype)], axis=sample_axis)
        qs = fwd(blk)
        for hk, q in qs.items():
            # to_host: in a multi-process run the per-chunk q is sharded
            # over the data axis across hosts; all-gather it (tiny (B, k)).
            from ..parallel.distributed import to_host
            chunks.setdefault(hk, []).append(to_host(q)[:n_real])
    return {hk: np.concatenate(parts, axis=0) for hk, parts in chunks.items()}
