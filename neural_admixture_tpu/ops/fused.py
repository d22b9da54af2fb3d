"""Pallas TPU kernels for the training hot path.

The dominant per-step cost is everything that touches the (B, M) genotype
plane: the decode matmul Q @ P, the clamped BCE against X = dosage/2, their
gradients, and the PCA projection X @ V. The reference materializes the
uint8 batch, an f32 X, and an f32 reconstruction in device memory each step
(/root/reference/neural_admixture/model/neural_admixture.py:404-431,
pack2bit.cu:38-62). Here, each kernel reads the *2-bit packed* batch
(uint32 words in planar order -- see ops.pack.planar_perm) and unpacks in
VMEM, so per step the M-plane HBM traffic is ~B*M/4 bytes per kernel pass
instead of >=12 B*M bytes:

  * fused_clamped_bce_sum(Q, P, u32, col_mask, row_w) -> scalar loss
      forward: per-(B,M)-tile  unpack -> Q@P -> clamp -> BCE -> partial sum
      backward: two recompute kernels (no residual tensors in HBM):
        dQ: grid (nB, nM), accumulates draw @ P^T over the M axis
        dP: grid (nM, nB), accumulates Q^T @ draw over the B axis
      Gradient semantics are identical to ops.loss.clamped_bce_sum
      (torch-matching -100 log clamp, (rec-x)/max(rec(1-rec),1e-12),
      boundary-inclusive clamp mask).
  * packed_xv(u32, V) -> X @ V  (f32 (B, D)), with dV = X^T dXp backward.

Tiles: TM = 2048 SNPs (= 128 u32 words = one lane row), TB sublanes chosen
from the batch size. M_pad must be a multiple of 2048 and B a multiple of TB.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pack import PLANAR_TILE

TM = PLANAR_TILE          # SNPs per tile
TW = TM // 16             # u32 words per tile
_LOG_CLAMP = -100.0
_GRAD_EPS = 1e-12

_INTERPRET = None


def _interpret() -> bool:
    """Pallas TPU kernels run interpreted on non-TPU backends (tests)."""
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() not in ("tpu", "axon")
    return _INTERPRET


def pick_tb(B: int) -> int:
    """Largest divisor of B that is a multiple of 8 and <= 256."""
    for tb in range(min(B, 256), 7, -1):
        if tb % 8 == 0 and B % tb == 0:
            return tb
    raise ValueError(
        f"batch size {B} has no divisor that is a multiple of 8; "
        "pad the batch to a multiple of 8")


def _unpack_x(u32_tile):
    """(TB, TW) uint32 -> (TB, TM) f32 dosage/2, missing -> 0 (planar order).

    Mosaic has no uint32->f32 cast; shift/mask in uint32, then go through
    int32 (values are in {0,1,2,3}, so the reinterpretation is exact).
    """
    parts = [((u32_tile >> jnp.uint32(2 * b)) & jnp.uint32(3))
             for b in range(16)]
    g = jnp.concatenate(parts, axis=-1).astype(jnp.int32)  # (TB, TM)
    x = g.astype(jnp.float32) * 0.5
    return jnp.where(g == 3, 0.0, x)


def _bce_terms(q, p, x, mask_rw):
    """Shared forward math for one tile. Returns (raw, rec, elementwise loss)."""
    raw = jnp.dot(q, p, preferred_element_type=jnp.float32)
    rec = jnp.clip(raw, 0.0, 1.0)
    logr = jnp.maximum(jnp.log(rec), _LOG_CLAMP)
    log1mr = jnp.maximum(jnp.log1p(-rec), _LOG_CLAMP)
    elem = -(x * logr + (1.0 - x) * log1mr) * mask_rw
    return raw, rec, elem


def _use_fast_recip() -> bool:
    """Approximate reciprocal in the BCE backward: measured 26% faster per
    backward pass on v5e with max 8e-6 relative gradient error
    (tools/tune_recip.py). NA_TPU_EXACT_DIV=1 forces exact division;
    NA_TPU_EXACT_DIV=0 forces the approx path even in interpret mode (used
    by tests to pin the production branch); unset -> approx on TPU, exact
    in interpret mode."""
    import os
    env = os.environ.get("NA_TPU_EXACT_DIV")
    if env == "1":
        return False
    if env == "0":
        return True
    return not _interpret()


def _draw_tile(q, p, x, mask_rw):
    """d(loss)/d(raw) for one tile (torch BCE+clamp backward)."""
    raw = jnp.dot(q, p, preferred_element_type=jnp.float32)
    rec = jnp.clip(raw, 0.0, 1.0)
    denom = jnp.maximum(rec * (1.0 - rec), _GRAD_EPS)
    if _use_fast_recip():
        drec = (rec - x) * pl.reciprocal(denom, approx=True)
    else:
        drec = (rec - x) / denom
    inside = jnp.logical_and(raw >= 0.0, raw <= 1.0)
    return jnp.where(inside, drec, 0.0) * mask_rw


# ----------------------------- forward ------------------------------------


def _fwd_kernel(q_ref, p_ref, u_ref, cm_ref, rw_ref, out_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        out_ref[0, 0] = 0.0

    x = _unpack_x(u_ref[:])
    mask_rw = cm_ref[:] * rw_ref[:]  # (1, TM) * (tb, 1)
    _, _, elem = _bce_terms(q_ref[:], p_ref[:], x, mask_rw)
    out_ref[0, 0] += jnp.sum(elem)


def _fwd_call(Q, P, u32, col_mask, row_w, tb):
    B, K = Q.shape
    m_pad = P.shape[1]
    grid = (B // tb, m_pad // TM)
    loss = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * m_pad + 8 * B * m_pad,
            bytes_accessed=B * m_pad // 4 + 4 * K * m_pad,
            transcendentals=2 * B * m_pad),
        interpret=_interpret(),
    )(Q, P, u32, col_mask.reshape(1, -1), row_w.reshape(-1, 1))
    return loss[0, 0]


# ----------------------------- backward ------------------------------------


def _bwd_dq_kernel(q_ref, p_ref, u_ref, cm_ref, rw_ref, g_ref, dq_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    x = _unpack_x(u_ref[:])
    mask_rw = cm_ref[:] * rw_ref[:]  # (1, TM) * (tb, 1)
    draw = _draw_tile(q_ref[:], p_ref[:], x, mask_rw) * g_ref[0, 0]
    dq_ref[:] += jax.lax.dot_general(
        draw, p_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _bwd_dp_kernel(q_ref, p_ref, u_ref, cm_ref, rw_ref, g_ref, dp_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dp_ref[:] = jnp.zeros_like(dp_ref)

    x = _unpack_x(u_ref[:])
    mask_rw = cm_ref[:] * rw_ref[:]  # (1, TM) * (tb, 1)
    draw = _draw_tile(q_ref[:], p_ref[:], x, mask_rw) * g_ref[0, 0]
    dp_ref[:] += jax.lax.dot_general(
        q_ref[:], draw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _bwd_call(Q, P, u32, col_mask, row_w, g, tb):
    B, K = Q.shape
    m_pad = P.shape[1]
    g2 = g.reshape(1, 1).astype(jnp.float32)
    flops = 4 * B * K * m_pad + 8 * B * m_pad
    byte_est = B * m_pad // 4 + 4 * K * m_pad

    dQ = pl.pallas_call(
        _bwd_dq_kernel,
        grid=(B // tb, m_pad // TM),
        in_specs=[
            pl.BlockSpec((tb, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tb, K), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=byte_est,
                                      transcendentals=0),
        interpret=_interpret(),
    )(Q, P, u32, col_mask.reshape(1, -1), row_w.reshape(-1, 1), g2)

    dP = pl.pallas_call(
        _bwd_dp_kernel,
        grid=(m_pad // TM, B // tb),
        in_specs=[
            pl.BlockSpec((tb, K), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TM), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, TW), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((K, TM), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=byte_est,
                                      transcendentals=0),
        interpret=_interpret(),
    )(Q, P, u32, col_mask.reshape(1, -1), row_w.reshape(-1, 1), g2)
    return dQ, dP


@jax.custom_vjp
def fused_clamped_bce_sum(Q, P, u32, col_mask, row_w):
    """Scalar sum of BCE(clip(Q @ P, 0, 1), X) over a tile-aligned batch.

    Q: (B, K) f32; P: (K, M_pad) f32 planar; u32: (B, M_pad/16) uint32
    planar-packed genotypes; col_mask: (M_pad,) planar; row_w: (B,).
    """
    return _fwd_call(Q, P, u32, col_mask, row_w, pick_tb(Q.shape[0]))


def _fused_fwd(Q, P, u32, col_mask, row_w):
    loss = fused_clamped_bce_sum(Q, P, u32, col_mask, row_w)
    return loss, (Q, P, u32, col_mask, row_w)


def _fused_bwd(res, g):
    Q, P, u32, col_mask, row_w = res
    dQ, dP = _bwd_call(Q, P, u32, col_mask, row_w, g, pick_tb(Q.shape[0]))
    return dQ, dP, None, None, None


fused_clamped_bce_sum.defvjp(_fused_fwd, _fused_bwd)


# ------------------------- X @ V projection --------------------------------


def _xv_kernel(u_ref, v_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = _unpack_x(u_ref[:])
    out_ref[:] += jnp.dot(x, v_ref[:], preferred_element_type=jnp.float32)


def _dv_kernel(u_ref, dxp_ref, dv_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dv_ref[:] = jnp.zeros_like(dv_ref)

    x = _unpack_x(u_ref[:])
    dv_ref[:] += jax.lax.dot_general(
        x, dxp_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@jax.custom_vjp
def packed_xv(u32, V):
    """X @ V where X is the (B, M_pad) dosage matrix unpacked from planar
    u32 words in-kernel. V: (M_pad, D) planar-ordered. Returns (B, D) f32."""
    B = u32.shape[0]
    m_pad, D = V.shape
    tb = pick_tb(B)
    return pl.pallas_call(
        _xv_kernel,
        grid=(B // tb, m_pad // TM),
        in_specs=[
            pl.BlockSpec((tb, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, D), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * m_pad * D, bytes_accessed=B * m_pad // 4,
            transcendentals=0),
        interpret=_interpret(),
    )(u32, V)


def _xv_fwd(u32, V):
    return packed_xv(u32, V), (u32, V.shape)


def _xv_bwd(res, g):
    u32, v_shape = res
    B = u32.shape[0]
    m_pad, D = v_shape
    tb = pick_tb(B)
    dV = pl.pallas_call(
        _dv_kernel,
        grid=(m_pad // TM, B // tb),
        in_specs=[
            pl.BlockSpec((tb, TW), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, D), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, D), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * m_pad * D, bytes_accessed=B * m_pad // 4,
            transcendentals=0),
        interpret=_interpret(),
    )(u32, g.astype(jnp.float32))
    return None, dV


packed_xv.defvjp(_xv_fwd, _xv_bwd)
