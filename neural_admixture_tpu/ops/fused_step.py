"""The consolidated multi-head M-plane training op.

The packed batch argument is TILE-MAJOR: shape (nT, B, 128) uint32, where
tile t holds planar-order SNP slots [2048 t, 2048 (t+1)) (see
ops.pack.planar_perm / tiles_from_rows). Row-major (B, W4) batches make
every kernel block a 512-byte-strided DMA, capping HBM throughput at ~66
GB/s on v5e; tile-major blocks are fully contiguous.

One custom-VJP op covers everything per training step that touches the
(B, M) genotype plane, for ALL heads at once, so the 2-bit packed batch is
read exactly three times per step (the reference reads multiple f32-sized
planes per head, model/neural_admixture.py:404-431):

  forward:
    pass 1  xv kernel:        Xp = X @ V             (packed read #1)
    (jnp)   encoder:          qs = softmax(heads(relu(common(rmsnorm(Xp)))))
    pass L  loss kernel:      sum_k BCE(clip(q_k P_k), X)   [only on epochs
            whose loss is logged -- DCE'd otherwise]
  backward:
    pass 2  dq kernel:        dq_k = draw_k @ P_k^T for all heads
                                                     (packed read #2)
    (jnp)   encoder VJP ->    d(enc params), dXp
    pass 3  dp+dv kernel:     dP_k = q_k^T draw_k for all heads, and
                              dV = X^T dXp          (packed read #3)

The op returns (bce_loss_sum, qs); the supervised CE term is added outside
in plain jnp (it only involves the tiny q matrices) and its gradient flows
in through the qs cotangent. Gradient semantics match ops.loss exactly
(torch BCE backward + boundary-inclusive clamp mask).

``snp_axis``: when set (shard_map execution), psums are inserted at the two
mathematically required points: the Xp partial sums in forward and the dXp
cotangent in backward.
"""
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import qp
from .fused import (TM, TW, _draw_tile, _bce_terms, _interpret, _unpack_x,
                    pick_tb)


def _encoder_apply(enc_params, Xp, head_keys: List[str]):
    qs = qp.encode_from_xp(enc_params, Xp)
    return {hk: qs[hk] for hk in head_keys}


# --------------------------- pallas kernels --------------------------------


def _xv_kernel(no_missing):
    """Xp^T = (X @ V)^T accumulated over M tiles, as (nB, D, tb) row blocks.

    Transposed output: a (tb, D) block with D=8 uses 8 of 128 lanes of every
    VMEM tile and store; (D, tb) is ~dense. The tb lane extent must be the
    block's FULL last dimension (Mosaic requires lane blocks in multiples of
    128 otherwise), hence the 3-D (nB, D, tb) shape instead of (D, B); the
    caller reassembles (B, D) once outside.

    The V operand arrives TRANSPOSED as (D, m_pad) with dense (D, TM)
    blocks: a (TM, D) block puts D=8 on lanes (8/128-dense operand tiles),
    measured 7.21 -> 4.15 ms/call isolated on v5e @1M SNPs, bit-exact
    (tools/tune_matmul_forms.py). The one (m_pad, D) -> (D, m_pad) XLA
    transpose per step outside costs ~0.15 ms of HBM traffic."""
    def kernel(u_ref, vt_ref, out_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        x = _unpack_x(u_ref[0], no_missing)
        out_ref[0] += jax.lax.dot_general(
            vt_ref[:], x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return kernel


def _loss_kernel(n_heads, no_missing, masked=True):
    """``masked=False`` (all-real batches, see make_fused_training_loss)
    drops the cm/rw operands and the two mask multiplies per genotype."""
    def kernel(*refs):
        q_refs = refs[:n_heads]
        p_refs = refs[n_heads:2 * n_heads]
        if masked:
            u_ref, cm_ref, rw_ref, out_ref = refs[2 * n_heads:]
            mask_rw = cm_ref[:] * rw_ref[:]
        else:
            u_ref, out_ref = refs[2 * n_heads:]
            mask_rw = None

        @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
        def _():
            out_ref[0, 0] = 0.0

        x = _unpack_x(u_ref[0], no_missing)
        total = 0.0
        for q_ref, p_ref in zip(q_refs, p_refs):
            _, _, elem = _bce_terms(q_ref[:], p_ref[:], x, mask_rw)
            total += jnp.sum(elem)
        out_ref[0, 0] += total
    return kernel


def _dq_dp_kernel(n_heads, no_missing, masked=True):
    """Merged pass 2: dq AND dp for all heads from ONE packed read.

    The expensive per-tile ``draw`` (decode matmul + BCE/clamp backward
    chain -- the dominant VPU cost) is computed once and feeds both
    reductions, where the split dq / dp+dv kernels each recomputed it.
    Grid is (nM, nB) with the batch axis innermost so each (k, TM) dp
    block accumulates in VMEM; each full (B, k) dq output has a constant
    index map, so it is VMEM-resident for the whole kernel and its rows
    accumulate across the outer M loop with no HBM revisit traffic.
    """
    def kernel(*refs):
        q_refs = refs[:n_heads]
        p_refs = refs[n_heads:2 * n_heads]
        if masked:
            u_ref, cm_ref, rw_ref, g_ref = refs[2 * n_heads:2 * n_heads + 4]
            mask_rw = cm_ref[:] * rw_ref[:]
            dq_refs = refs[2 * n_heads + 4:3 * n_heads + 4]
            dp_refs = refs[3 * n_heads + 4:]
        else:
            u_ref, g_ref = refs[2 * n_heads:2 * n_heads + 2]
            mask_rw = None
            dq_refs = refs[2 * n_heads + 2:3 * n_heads + 2]
            dp_refs = refs[3 * n_heads + 2:]
        j = pl.program_id(0)  # M tile (outer)
        i = pl.program_id(1)  # B tile (inner)

        x = _unpack_x(u_ref[0], no_missing)
        g = g_ref[0, 0]
        for q_ref, p_ref, dq_ref, dp_ref in zip(q_refs, p_refs, dq_refs,
                                                dp_refs):
            q = q_ref[:]
            tb = q.shape[0]
            draw = _draw_tile(q, p_ref[:], x, mask_rw)
            # dq transposed (k, tb): the small head dim on sublanes, batch
            # on lanes -- a (tb, k<=few) result uses k of 128 lanes of every
            # VMEM tile and store. The full (nB, k, tb) output is resident
            # (constant index map) and accumulates over the outer M loop;
            # only the leading (untiled) dim is indexed dynamically, which
            # Mosaic lowers as a plain block offset.
            dqt_blk = jax.lax.dot_general(
                p_ref[:], draw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(j == 0)
            def _(dq_ref=dq_ref, dqt_blk=dqt_blk):
                dq_ref[i] = dqt_blk

            @pl.when(j > 0)
            def _(dq_ref=dq_ref, dqt_blk=dqt_blk):
                dq_ref[i] += dqt_blk

            @pl.when(i == 0)
            def _(dp_ref=dp_ref):
                dp_ref[:] = jnp.zeros_like(dp_ref)
            # dp wants g * q^T draw; scaling the tiny (tb, k) q is far
            # cheaper than scaling the (tb, TM) draw.
            dp_ref[:] += jax.lax.dot_general(
                q * g, draw, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return kernel


def _dvt_kernel(no_missing):
    """Pass 3: dV^T = dXp^T X. Separate from pass 2 because dXp is the
    encoder VJP of pass 2's dq -- a true sequential dependency.

    Computed TRANSPOSED: a (TM, D) block with D=8 uses 8 of 128 lanes of
    every register and store; the (D, TM) layout is dense. The caller
    transposes the small (D, m_pad) result once outside."""
    def kernel(u_ref, dxp_ref, dvt_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            dvt_ref[:] = jnp.zeros_like(dvt_ref)
        x = _unpack_x(u_ref[0], no_missing)
        dvt_ref[:] += jax.lax.dot_general(
            dxp_ref[:], x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return kernel


# --------------------------- pallas call wrappers --------------------------


def _q_specs(ks, tb, order="bm"):
    if order == "bm":
        return [pl.BlockSpec((tb, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM) for k in ks]
    return [pl.BlockSpec((tb, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM) for k in ks]


def _p_specs(ks, order="bm"):
    if order == "bm":
        return [pl.BlockSpec((k, TM), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM) for k in ks]
    return [pl.BlockSpec((k, TM), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM) for k in ks]


def _common_specs(tb, order="bm", masked=True):
    """Specs for (tiles[, col_mask, row_weight]). The packed batch is
    tile-major (nT, B, TW): each (1, tb, TW) block is one contiguous DMA
    (row-major (B, W4) layout reads 512-byte strided strips, which caps HBM
    efficiency at ~8%% -- measured in tools/tune_unpack.py). With
    ``masked=False`` the mask operands are not passed at all."""
    if order == "bm":
        specs = [
            pl.BlockSpec((1, tb, TW), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ]
    else:
        specs = [
            pl.BlockSpec((1, tb, TW), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ]
    return specs if masked else specs[:1]


def _xv_call(u32, V, tb, no_missing=False):
    B = u32.shape[1]
    m_pad, D = V.shape
    vt = V.T  # dense (D, TM) operand blocks; see _xv_kernel docstring
    xpt = pl.pallas_call(
        _xv_kernel(no_missing),
        grid=(B // tb, m_pad // TM),
        in_specs=[
            pl.BlockSpec((1, tb, TW), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, tb), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // tb, D, tb), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * m_pad * D, bytes_accessed=B * m_pad // 4,
            transcendentals=0),
        interpret=_interpret(),
    )(u32, vt)
    return xpt.transpose(0, 2, 1).reshape(B, D)


def _loss_call(qs, Ps, u32, cm2, rw2, tb, no_missing=False, masked=True):
    ks = [q.shape[1] for q in qs]
    B = u32.shape[1]
    m_pad = u32.shape[0] * TM
    operands = (*qs, *Ps, u32, cm2, rw2) if masked else (*qs, *Ps, u32)
    out = pl.pallas_call(
        _loss_kernel(len(ks), no_missing, masked),
        grid=(B // tb, m_pad // TM),
        in_specs=(_q_specs(ks, tb) + _p_specs(ks)
                  + _common_specs(tb, masked=masked)),
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * m_pad * (2 * sum(ks) + 8 * len(ks)),
            bytes_accessed=B * m_pad // 4,
            transcendentals=2 * B * m_pad * len(ks)),
        interpret=_interpret(),
    )(*operands)
    return out[0, 0]


def _dq_dp_call(qs, Ps, u32, cm2, rw2, g, tb, no_missing=False, masked=True):
    ks = [q.shape[1] for q in qs]
    B = u32.shape[1]
    m_pad = u32.shape[0] * TM
    g2 = jnp.asarray(g, jnp.float32).reshape(1, 1)
    operands = ((*qs, *Ps, u32, cm2, rw2, g2) if masked
                else (*qs, *Ps, u32, g2))
    outs = pl.pallas_call(
        _dq_dp_kernel(len(ks), no_missing, masked),
        grid=(m_pad // TM, B // tb),
        in_specs=(_q_specs(ks, tb, "mb") + _p_specs(ks, "mb")
                  + _common_specs(tb, "mb", masked=masked)
                  + [pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                                  memory_space=pltpu.SMEM)]),
        out_specs=([pl.BlockSpec((B // tb, k, tb), lambda j, i: (0, 0, 0),
                                 memory_space=pltpu.VMEM) for k in ks]
                   + [pl.BlockSpec((k, TM), lambda j, i: (0, j),
                                   memory_space=pltpu.VMEM) for k in ks]),
        out_shape=([jax.ShapeDtypeStruct((B // tb, k, tb), jnp.float32)
                    for k in ks]
                   + [jax.ShapeDtypeStruct((k, m_pad), jnp.float32)
                      for k in ks]),
        cost_estimate=pl.CostEstimate(
            flops=B * m_pad * 6 * sum(ks), bytes_accessed=B * m_pad // 4,
            transcendentals=0),
        interpret=_interpret(),
    )(*operands)
    ks_n = len(ks)
    dqs = [o.transpose(0, 2, 1).reshape(B, k)
           for o, k in zip(outs[:ks_n], ks)]
    return dqs, outs[ks_n:]


def _dv_call(u32, dXp, tb, no_missing=False):
    B = u32.shape[1]
    m_pad = u32.shape[0] * TM
    D = dXp.shape[1]
    dvt = pl.pallas_call(
        _dvt_kernel(no_missing),
        grid=(m_pad // TM, B // tb),
        in_specs=[
            pl.BlockSpec((1, tb, TW), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, D), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, TM), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * m_pad * D, bytes_accessed=B * m_pad // 4,
            transcendentals=0),
        interpret=_interpret(),
    )(u32, dXp)
    return dvt.T


def fused_infer_q(params: Dict, tiles_batch, no_missing: bool = False
                  ) -> Dict:
    """Encoder-only forward from a TILE-MAJOR (nT, B, words) packed batch.

    Inference needs only Xp = X @ V before the tiny encoder; computing it
    with the xv Pallas kernel reads the 2-bit words once and never
    materializes the (B, M) f32 X that the XLA path
    (ops.pack.unpack_dosage_x_planar -> matmul) expands to -- 16x the HBM
    traffic at biobank M. Backs the engine's post-training Q pass and the
    projective-inference CLI (reference: encoder-only batched forward,
    /root/reference/neural_admixture/src/inference.py:67-77)."""
    tb = pick_tb(tiles_batch.shape[1])
    Xp = _xv_call(tiles_batch, params["V"], tb, no_missing)
    return qp.encode_from_xp(params, Xp)


# ------------------------------ the op --------------------------------------


def make_fused_training_loss(head_keys: List[str],
                             snp_axis: Optional[str] = None,
                             no_missing: bool = False,
                             masked: bool = True):
    """Build the (V, enc_params, Ps, u32, col_mask, row_w) ->
    (bce_loss_sum, qs) op with the 3-pass custom VJP described above.

    ``masked=False`` is a trace-time specialization for batches the caller
    proves are ALL-REAL rows (the engine's full batches under the
    remainder-batch scheme): the loss/dq_dp kernels drop the col_mask *
    row_weight operands and their per-genotype multiplies. Exactness does
    not depend on masking the padded SNP columns because (a) padded packed
    bits decode to x = 0 and (b) padded P columns are exactly 0 at init
    (models.qp.init_params) and stay 0 through training (their grads are 0
    by (a)+(b), Adam maps zero moments + zero grad to a zero update, and
    the [0,1] clamp fixes 0) -- so every padded-column loss/draw term is
    exactly 0 unmasked. The col_mask/row_w arguments are still accepted
    (and ignored) so both variants share a call signature."""
    head_keys = sorted(head_keys)

    def _forward(V, enc_params, Ps: Dict, u32, col_mask, row_w):
        tb = pick_tb(u32.shape[1])
        Xp = _xv_call(u32, V, tb, no_missing)
        if snp_axis is not None:
            Xp = jax.lax.psum(Xp, snp_axis)
        qs = _encoder_apply(enc_params, Xp, head_keys)
        q_list = [qs[hk] for hk in head_keys]
        p_list = [Ps[hk] for hk in head_keys]
        cm2 = col_mask.reshape(1, -1)
        rw2 = row_w.reshape(-1, 1)
        loss = _loss_call(q_list, p_list, u32, cm2, rw2, tb,
                          no_missing, masked)
        return loss, qs, Xp

    @jax.custom_vjp
    def fused_training_loss(V, enc_params, Ps, u32, col_mask, row_w):
        loss, qs, _ = _forward(V, enc_params, Ps, u32, col_mask, row_w)
        return loss, qs

    def fwd(V, enc_params, Ps, u32, col_mask, row_w):
        loss, qs, Xp = _forward(V, enc_params, Ps, u32, col_mask, row_w)
        return (loss, qs), (enc_params, Ps, u32, col_mask, row_w, Xp)

    def bwd(res, cts):
        g_loss, g_qs = cts
        enc_params, Ps, u32, col_mask, row_w, Xp = res
        tb = pick_tb(u32.shape[1])
        cm2 = col_mask.reshape(1, -1)
        rw2 = row_w.reshape(-1, 1)

        qs, enc_vjp = jax.vjp(
            lambda ep, xp: _encoder_apply(ep, xp, head_keys), enc_params, Xp)
        q_list = [qs[hk] for hk in head_keys]
        p_list = [Ps[hk] for hk in head_keys]

        dq_list, dp_list = _dq_dp_call(q_list, p_list, u32, cm2, rw2,
                                       g_loss, tb, no_missing, masked)
        dqs = {hk: dq_list[i] * g_loss + g_qs[hk]
               for i, hk in enumerate(head_keys)}
        denc, dXp = enc_vjp(dqs)
        if snp_axis is not None:
            # True cotangent of this shard's Xp partial sums over the snp
            # shards that consumed the replicated psum result.
            dXp = jax.lax.psum(dXp, snp_axis)

        dV = _dv_call(u32, dXp, tb, no_missing)
        dPs = {hk: dp_list[i] for i, hk in enumerate(head_keys)}
        return (dV, denc, dPs, None, None, None)

    fused_training_loss.defvjp(fwd, bwd)
    return fused_training_loss
