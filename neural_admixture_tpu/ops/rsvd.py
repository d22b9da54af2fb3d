"""Randomized SVD of the genotype matrix, on device.

Replaces the reference's host-side Cython RSVD
(/root/reference/neural_admixture/src/svd.py:39-84 with OpenMP GEMM kernels in
/root/reference/neural_admixture/src/utils_c/rsvd.pyx): same algorithm and
hyperparameters (Gaussian test matrix from np.random.default_rng(seed),
k' = max(k + oversampling, 20), 2 power iterations with QR
re-orthonormalization, dense SVD of B = Qt A, deterministic sign flip), but
the big mixed-dtype GEMMs A @ Omega and Qt @ A run on the TPU MXU over
2-bit-packed row blocks, unpacked on the fly -- the N x M float matrix never
materializes.

Note the reference feeds *raw* genotype codes (missing = 3 included) into the
SVD; we reproduce that.
"""
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pack import unpack_genotypes

_PREC = jax.lax.Precision.HIGHEST


def svd_flip(V: jnp.ndarray, U: jnp.ndarray) -> jnp.ndarray:
    """Sign-normalize rows of Vt using dominant entries of U's columns
    (same convention as /root/reference/neural_admixture/src/svd.py:16-37)."""
    idx = jnp.argmax(jnp.abs(U), axis=0)
    signs = jnp.sign(U[idx, jnp.arange(U.shape[1])])
    return V * signs[:, None]


def _pad_rows(x: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    if n_pad == x.shape[0]:
        return x
    pad = jnp.zeros((n_pad - x.shape[0],) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad], axis=0)


@partial(jax.jit, static_argnames=("block_rows",))
def _mul_A_omega(packed: jnp.ndarray, Omega: jnp.ndarray, block_rows: int):
    """(N, W) packed x (4W, k') -> (N_pad, k') = A @ Omega over row blocks."""
    n_pad = packed.shape[0]
    nb = n_pad // block_rows
    kp = Omega.shape[1]

    def body(i, Y):
        blk = jax.lax.dynamic_slice_in_dim(packed, i * block_rows, block_rows)
        A = unpack_genotypes(blk).astype(jnp.float32)
        Yb = jnp.dot(A, Omega, precision=_PREC)
        return jax.lax.dynamic_update_slice_in_dim(Y, Yb, i * block_rows, 0)

    return jax.lax.fori_loop(0, nb, body,
                             jnp.zeros((n_pad, kp), jnp.float32))


@partial(jax.jit, static_argnames=("block_rows",))
def _mul_Qt_A(Qt: jnp.ndarray, packed: jnp.ndarray, block_rows: int):
    """(k', N_pad) x (N, W) packed -> (k', 4W) = Qt @ A over row blocks."""
    n_pad = packed.shape[0]
    nb = n_pad // block_rows
    m_pad = packed.shape[1] * 4

    def body(i, B):
        blk = jax.lax.dynamic_slice_in_dim(packed, i * block_rows, block_rows)
        A = unpack_genotypes(blk).astype(jnp.float32)
        Qb = jax.lax.dynamic_slice_in_dim(Qt, i * block_rows, block_rows, axis=1)
        return B + jnp.dot(Qb, A, precision=_PREC)

    return jax.lax.fori_loop(0, nb, body,
                             jnp.zeros((Qt.shape[0], m_pad), jnp.float32))


def rsvd(packed, N: int, M: int, k: int = 8, seed: int = 42,
         oversampling: int = 10, power_iterations: int = 2,
         block_rows: int = 4096) -> np.ndarray:
    """Randomized SVD of the packed genotype matrix. Returns Vt_k (k, M) f32.

    ``packed``: (N, W) uint8, 2-bit packed, sample-major (padding columns are
    genotype 0 and therefore contribute nothing to the factorization).
    """
    packed = jnp.asarray(packed)
    n_pad = ((N + block_rows - 1) // block_rows) * block_rows
    packed = _pad_rows(packed, n_pad)

    k_prime = max(k + oversampling, 20)
    # Same host RNG stream as the reference's Omega (svd.py:44-49).
    rng = np.random.default_rng(seed)
    Omega_np = rng.standard_normal(size=(M, k_prime), dtype=np.float32)
    m_pad = packed.shape[1] * 4
    Omega = jnp.asarray(np.pad(Omega_np, ((0, m_pad - M), (0, 0))))

    # Large mixed-dtype GEMMs run on device over packed blocks; the small
    # (N x k') QR and (k' x M) SVD run on the host (LAPACK) -- they are
    # negligible FLOPs, and keeping them off-device avoids per-dataset-shape
    # XLA compiles of QR/SVD (expensive on remote/tunneled backends).
    Y = np.asarray(_mul_A_omega(packed, Omega, block_rows))[:N]
    for _ in range(power_iterations):
        Q_y, _ = np.linalg.qr(Y, mode="reduced")
        Qt = jnp.asarray(np.ascontiguousarray(
            np.pad(Q_y, ((0, n_pad - N), (0, 0))).T))
        B_tmp = np.asarray(_mul_Qt_A(Qt, packed, block_rows))   # (k', m_pad)
        Y = np.asarray(_mul_A_omega(
            packed, jnp.asarray(np.ascontiguousarray(B_tmp.T)),
            block_rows))[:N]

    Q, _ = np.linalg.qr(Y, mode="reduced")
    Qt = jnp.asarray(np.ascontiguousarray(
        np.pad(Q, ((0, n_pad - N), (0, 0))).T))
    B = np.asarray(_mul_Qt_A(Qt, packed, block_rows))           # (k', m_pad)
    Ut, _St, Vt = np.linalg.svd(B[:, :M], full_matrices=False)
    Vt = np.asarray(svd_flip(jnp.asarray(Vt), jnp.asarray(Ut)))
    return Vt[:k, :].astype(np.float32)
