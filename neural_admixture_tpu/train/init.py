"""P-matrix initialization.

Unsupervised (mirrors /root/reference/neural_admixture/model/train.py:44-69):
  1. project genotypes to PCA space in row blocks: X_pca = (G/2) @ V^T --
     note the reference does NOT impute missing genotypes here (3/2 = 1.5
     enters the projection); we reproduce that;
  2. fit a full-covariance GMM per K in PCA space (ops.gmm);
  3. P_k = clip(means_k @ V, 5e-6, 1 - 5e-6), rows concatenated over K
     ascending.

Supervised (mirrors /root/reference/neural_admixture/model/train.py:72-82):
  P rows are per-population mean genotype vectors on the raw 0..2(+3) dosage
  scale (not divided by 2, missing included in the mean -- faithful to the
  reference).
"""
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gmm import fit_gmm
from ..ops.pack import unpack_genotypes

_PREC = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("block_rows",))
def _project_blocks(packed, Vt, block_rows: int):
    """(N_pad, W) packed, Vt (D, 4W) -> (N_pad, D) = (A/2) @ Vt^T."""
    n_pad = packed.shape[0]
    nb = n_pad // block_rows
    D = Vt.shape[0]

    def body(i, out):
        blk = jax.lax.dynamic_slice_in_dim(packed, i * block_rows, block_rows)
        A = unpack_genotypes(blk).astype(jnp.float32) * 0.5
        Xb = jnp.dot(A, Vt.T, precision=_PREC)
        return jax.lax.dynamic_update_slice_in_dim(out, Xb, i * block_rows, 0)

    return jax.lax.fori_loop(0, nb, body, jnp.zeros((n_pad, D), jnp.float32))


@jax.jit
def _project_one_block(blk, Vt):
    """One host-streamed row block of (A/2) @ Vt^T (out-of-core path)."""
    A = unpack_genotypes(blk).astype(jnp.float32) * 0.5
    return jnp.dot(A, Vt.T, precision=_PREC)


def project_pca(packed, V: np.ndarray, N: int, block_rows: int = 4096,
                stream: bool = None) -> jnp.ndarray:
    """Project packed genotypes onto V (D, M): returns X_pca (N, D).

    ``stream``: host-streaming (out-of-core) mode -- packed rows stay in
    host memory and transfer one block at a time (one pass over the data).
    None = auto by size (utils.hbm.should_stream_host)."""
    from ..utils.hbm import should_stream_host

    if stream is None:
        stream = should_stream_host(N * packed.shape[1])
    m_pad = packed.shape[1] * 4
    Vt = jnp.asarray(V, jnp.float32)
    if Vt.shape[1] != m_pad:
        Vt = jnp.concatenate(
            [Vt, jnp.zeros((Vt.shape[0], m_pad - Vt.shape[1]), jnp.float32)],
            axis=1)
    if stream:
        packed_np = np.asarray(packed)[:N]
        out = np.empty((N, Vt.shape[0]), np.float32)
        for i in range(0, N, block_rows):
            j = min(i + block_rows, N)
            blk = packed_np[i:j]
            if blk.shape[0] < block_rows:  # static shape: one trace
                blk = np.concatenate(
                    [blk, np.zeros((block_rows - blk.shape[0], blk.shape[1]),
                                   blk.dtype)], axis=0)
            out[i:j] = np.asarray(_project_one_block(jnp.asarray(blk),
                                                     Vt))[:j - i]
        return jnp.asarray(out)
    packed = jnp.asarray(packed)
    n_pad = ((N + block_rows - 1) // block_rows) * block_rows
    if n_pad != packed.shape[0]:
        packed = jnp.concatenate(
            [packed, jnp.zeros((n_pad - packed.shape[0], packed.shape[1]),
                               packed.dtype)], axis=0)
    return _project_blocks(packed, Vt, block_rows)[:N]


def pca_coords(packed, V: np.ndarray, N: int,
               rows: Tuple[int, int] = None,
               stream: bool = None) -> jnp.ndarray:
    """Global (N, D) PCA coordinates (G/2) @ V^T, the projection
    init_p_unsupervised clusters. Exposed so callers that reuse one
    projection across several GMM seeds (--init_restarts) pay the
    full-matrix pass ONCE: it depends only on (packed, V), never on the
    restart seed. ``rows``: multi-host mode (local rows projected, tiny
    coordinates all-gathered). ``stream``: see project_pca."""
    if rows is not None:
        from ..parallel.distributed import gather_ragged_rows
        start, end = rows
        X_local = np.asarray(project_pca(packed[:end - start], V,
                                         end - start, stream=stream))
        X_pca = jnp.asarray(gather_ragged_rows(X_local))
        assert X_pca.shape[0] == N, (X_pca.shape, N)
        return X_pca
    return project_pca(packed, V, N, stream=stream)


def init_p_unsupervised(packed, V: np.ndarray, N: int, M: int, ks: List[int],
                        seed: int, rows: Tuple[int, int] = None,
                        stream: bool = None, x_pca=None) -> np.ndarray:
    """GMM-based P init. Returns (sum(ks), M) float32, rows per K ascending.

    ``rows``: multi-host mode -- ``packed`` holds only this process's sample
    rows [start, end). Each host projects its local rows, the tiny (N, D)
    PCA coordinates are all-gathered, and every host runs the identical GMM
    (same key, same data) so the resulting P needs no broadcast.

    ``stream``: host-streaming PCA projection (see project_pca); None =
    auto by size. ``x_pca``: precomputed pca_coords (seed-independent;
    pass it when calling repeatedly with different seeds)."""
    X_pca = pca_coords(packed, V, N, rows=rows,
                       stream=stream) if x_pca is None else x_pca
    Vj = jnp.asarray(V, jnp.float32)  # (D, M)
    P_blocks = []
    for K in sorted(ks):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), K)
        res = fit_gmm(X_pca, K, key)
        P_k = jnp.clip(jnp.dot(res.means, Vj, precision=_PREC),
                       5e-6, 1.0 - 5e-6)
        P_blocks.append(np.asarray(P_k))
    return np.concatenate(P_blocks, axis=0)


def encode_populations(pops: List[str], K: int) -> Tuple[np.ndarray, dict]:
    """Map string population labels to 0..K-1 indices
    (as /root/reference/neural_admixture/model/train.py:78-81)."""
    ancestry_dict = {anc: idx for idx, anc in enumerate(sorted(np.unique(pops)))}
    assert len(ancestry_dict) == K, (
        f"Number of ancestries in training ground truth ({len(ancestry_dict)}) "
        f"is not equal to the value of K ({K})")
    y = np.asarray([ancestry_dict[p] for p in pops], dtype=np.int64)
    return y, ancestry_dict


def init_p_supervised(G: np.ndarray, y: np.ndarray, K: int) -> np.ndarray:
    """Per-class mean genotype rows (K, M) float32, raw dosage scale."""
    return np.vstack([G[y == idx, :].astype(np.float32).mean(axis=0)
                      for idx in range(K)])


def init_p_supervised_packed(packed, y: np.ndarray, K: int, M: int,
                             block: int = 4096,
                             rows: Tuple[int, int] = None) -> np.ndarray:
    """Per-class mean genotype rows computed from 2-bit packed rows in device
    blocks (raw dosage scale, missing=3 included -- same semantics as
    init_p_supervised / reference model/train.py:82).

    ``rows``: multi-host mode -- ``packed`` holds sample rows [start, end)
    and ``y`` the full global labels; per-class sums and counts are combined
    across hosts."""
    from ..io.packed import unpack_2bit_rows

    if rows is not None:
        start, end = rows
        packed = packed[:end - start]
        y = y[start:end]
    N = len(y)
    sums = np.zeros((K, M), dtype=np.float64)
    counts = np.bincount(y, minlength=K).astype(np.float64)
    for i in range(0, N, block):
        G_blk = unpack_2bit_rows(np.asarray(packed[i:i + block]), M)
        for k in range(K):
            cls_rows = G_blk[y[i:i + block] == k]
            if cls_rows.size:
                sums[k] += cls_rows.sum(axis=0, dtype=np.float64)
    if rows is not None:
        from ..parallel.distributed import allsum_hosts
        sums = allsum_hosts(sums)
        counts = allsum_hosts(counts)
    return (sums / np.maximum(counts[:, None], 1.0)).astype(np.float32)
