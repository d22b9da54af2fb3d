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

``indexed_blk``: gather-free batching. The op takes the full RESIDENT
(nT, R, TW) array plus a (nbk,) vector of block ids (units of
``indexed_blk`` rows -- exactly what the engine's block sampling draws)
and every kernel reads its sampled (1, blk, TW) u32 blocks straight from
the resident array through scalar-prefetch index maps
(PrefetchScalarGridSpec). Materializing the gathered batch costs ~1.7
ms/step at B=800 x 1M SNPs on v5e -- even for a contiguous slice -- all
of it the XLA copy itself (tools/tune_gather2.py); reading at the sampled
offsets inside the kernels removes that copy entirely
(tools/tune_gather3.py).
"""
import os
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import qp
from .fused import (TM, TW, _dot_in, _draw_tile, _bce_terms, _heavy_cap,
                    _interpret, _unpack_x, pick_tb, pick_tb_wide)


def _encoder_apply(enc_params, Xp, head_keys: List[str]):
    qs = qp.encode_from_xp(enc_params, Xp)
    return {hk: qs[hk] for hk in head_keys}


# --------------------------- pallas kernels --------------------------------


def _unpack_cat(u_refs, no_missing, scale=True):
    """Unpack g_ops (1, tb, TW) u32 blocks into one (g_ops*tb, TM) x.

    Indexed (gather-free) calls DMA ``g_ops`` scattered sample blocks per
    grid step; concatenating on sublanes reproduces exactly the rows a
    gathered (g_ops*tb)-row tile would hold, so the per-tile math (and its
    float accumulation order) is identical to the gathered program at
    tb_eff = g_ops * tb."""
    xs = [_unpack_x(u[0], no_missing, scale) for u in u_refs]
    return xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0)


def _unpack_m(u_refs, mi, no_missing, scale=True, m_ops=1):
    """Unpack SNP slab ``mi`` of this grid step's packed block.

    M-batched (m_ops > 1, gathered path only) steps DMA one
    (m_ops, tb, TW) block -- m_ops consecutive planar tiles -- and the
    kernel loops the per-tile math over the slabs, so the ~0.45 us fixed
    cost per grid step is paid once per m_ops tiles instead of per tile
    (pick_m). Indexed calls keep m_ops == 1 (their u_refs carry g_ops
    scattered SAMPLE blocks instead; the two batchings are exclusive)."""
    if m_ops > 1:
        return _unpack_x(u_refs[0][mi], no_missing, scale)
    return _unpack_cat(u_refs, no_missing, scale)


def _msl(mi):
    """Lane slice of SNP slab ``mi`` inside an m_ops-wide operand block."""
    return slice(mi * TM, (mi + 1) * TM)


def _xv_kernel(no_missing, g_ops=1, m_ops=1):
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
    transpose per step outside costs ~0.15 ms of HBM traffic.

    x is unpacked UNSCALED (raw dosage g); the caller passes V^T already
    halved (fused into the existing per-step transpose) -- one VPU op per
    genotype saved, bit-exact (see _unpack_x's scale docstring)."""
    def kernel(*refs):
        u_refs = refs[:g_ops]
        vt_ref, out_ref = refs[g_ops:]

        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        acc = None
        for mi in range(m_ops):
            x = _unpack_m(u_refs, mi, no_missing, scale=False, m_ops=m_ops)
            vt = vt_ref[:] if m_ops == 1 else vt_ref[:, _msl(mi)]
            d = jax.lax.dot_general(
                _dot_in(vt), _dot_in(x), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        out_ref[0] += acc
    return kernel


def _loss_kernel(n_heads, no_missing, masked=True, g_ops=1, m_ops=1):
    """``masked=False`` (all-real batches, see make_fused_training_loss)
    drops the cm/rw operands and the two mask multiplies per genotype."""
    def kernel(*refs):
        q_refs = refs[:n_heads]
        p_refs = refs[n_heads:2 * n_heads]
        u_refs = refs[2 * n_heads:2 * n_heads + g_ops]
        if masked:
            cm_ref, rw_ref, out_ref = refs[2 * n_heads + g_ops:]
        else:
            out_ref, = refs[2 * n_heads + g_ops:]

        @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
        def _():
            out_ref[0, 0] = 0.0

        total = 0.0
        for mi in range(m_ops):
            x = _unpack_m(u_refs, mi, no_missing, m_ops=m_ops)
            if masked:
                cm = cm_ref[:] if m_ops == 1 else cm_ref[:, _msl(mi)]
                mask_rw = cm * rw_ref[:]
            else:
                mask_rw = None
            for q_ref, p_ref in zip(q_refs, p_refs):
                p = p_ref[:] if m_ops == 1 else p_ref[:, _msl(mi)]
                _, _, elem = _bce_terms(q_ref[:], p, x, mask_rw)
                total += jnp.sum(elem)
        out_ref[0, 0] += total
    return kernel


def _dq_dp_kernel(n_heads, no_missing, masked=True, g_ops=1, m_ops=1):
    """Merged pass 2: dq AND dp for all heads from ONE packed read.

    The expensive per-tile ``draw`` (decode matmul + BCE/clamp backward
    chain -- the dominant VPU cost) is computed once and feeds both
    reductions, where the split dq / dp+dv kernels each recomputed it.
    Grid is (nM, nB) with the batch axis innermost so each (k, m_ops*TM)
    dp block accumulates in VMEM; each full (B, k) dq output has a
    constant index map, so it is VMEM-resident for the whole kernel and
    its rows accumulate across the outer M loop with no HBM revisit
    traffic. With m_ops > 1 the per-slab dq partials accumulate in
    registers across the mi loop and hit VMEM once per grid step.
    """
    def kernel(*refs):
        q_refs = refs[:n_heads]
        p_refs = refs[n_heads:2 * n_heads]
        u_refs = refs[2 * n_heads:2 * n_heads + g_ops]
        rest = refs[2 * n_heads + g_ops:]
        if masked:
            cm_ref, rw_ref, g_ref = rest[:3]
            dq_refs = rest[3:3 + n_heads]
            dp_refs = rest[3 + n_heads:]
        else:
            g_ref = rest[0]
            dq_refs = rest[1:1 + n_heads]
            dp_refs = rest[1 + n_heads:]
        j = pl.program_id(0)  # M tile (outer)
        i = pl.program_id(1)  # B tile (inner)

        g = g_ref[0, 0]
        for dp_ref in dp_refs:
            @pl.when(i == 0)
            def _(dp_ref=dp_ref):
                dp_ref[:] = jnp.zeros_like(dp_ref)
        dqt_acc = [None] * n_heads
        for mi in range(m_ops):
            x = _unpack_m(u_refs, mi, no_missing, m_ops=m_ops)
            if masked:
                cm = cm_ref[:] if m_ops == 1 else cm_ref[:, _msl(mi)]
                mask_rw = cm * rw_ref[:]
            else:
                mask_rw = None
            for h, (q_ref, p_ref, dp_ref) in enumerate(
                    zip(q_refs, p_refs, dp_refs)):
                q = q_ref[:]
                p = p_ref[:] if m_ops == 1 else p_ref[:, _msl(mi)]
                draw = _dot_in(_draw_tile(q, p, x, mask_rw))
                # dq transposed (k, tb): the small head dim on sublanes,
                # batch on lanes -- a (tb, k<=few) result uses k of 128
                # lanes of every VMEM tile and store. The full (nB, k, tb)
                # output is resident (constant index map) and accumulates
                # over the outer M loop; only the leading (untiled) dim is
                # indexed dynamically, which Mosaic lowers as a plain
                # block offset.
                dqt_blk = jax.lax.dot_general(
                    _dot_in(p), draw, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dqt_acc[h] = (dqt_blk if dqt_acc[h] is None
                              else dqt_acc[h] + dqt_blk)
                # dp wants g * q^T draw; scaling the tiny (tb, k) q is far
                # cheaper than scaling the (tb, TM) draw.
                dp_blk = jax.lax.dot_general(
                    _dot_in(q * g), draw, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if m_ops == 1:
                    dp_ref[:] += dp_blk
                else:
                    dp_ref[:, _msl(mi)] += dp_blk
        for dq_ref, dqt_blk in zip(dq_refs, dqt_acc):
            @pl.when(j == 0)
            def _(dq_ref=dq_ref, dqt_blk=dqt_blk):
                dq_ref[i] = dqt_blk

            @pl.when(j > 0)
            def _(dq_ref=dq_ref, dqt_blk=dqt_blk):
                dq_ref[i] += dqt_blk
    return kernel


def _loss_dq_dp_kernel(n_heads, no_missing, masked=True, g_ops=1, m_ops=1):
    """Merged loss + dq + dp: the logged-epoch forward-with-gradients pass.

    On epochs whose loss is logged the engine needs the BCE value AND its
    gradients at the same parameters; the separate loss kernel re-reads
    the packed batch and recomputes the decode matmul that the dq_dp
    kernel already evaluates. Emitting the loss from the dq_dp kernel
    (computed UNSCALED -- the caller applies the loss cotangent outside)
    drops logged epochs from 4 packed passes to 3, the same count as
    unlogged ones. Output order: (loss, dq..., dp...)."""
    def kernel(*refs):
        q_refs = refs[:n_heads]
        p_refs = refs[n_heads:2 * n_heads]
        u_refs = refs[2 * n_heads:2 * n_heads + g_ops]
        rest = refs[2 * n_heads + g_ops:]
        if masked:
            cm_ref, rw_ref = rest[:2]
            rest = rest[2:]
        loss_ref = rest[0]
        dq_refs = rest[1:1 + n_heads]
        dp_refs = rest[1 + n_heads:]
        j = pl.program_id(0)  # M tile (outer)
        i = pl.program_id(1)  # B tile (inner)

        @pl.when(jnp.logical_and(j == 0, i == 0))
        def _():
            loss_ref[0, 0] = 0.0

        for dp_ref in dp_refs:
            @pl.when(i == 0)
            def _(dp_ref=dp_ref):
                dp_ref[:] = jnp.zeros_like(dp_ref)
        total = 0.0
        dqt_acc = [None] * n_heads
        for mi in range(m_ops):
            x = _unpack_m(u_refs, mi, no_missing, m_ops=m_ops)
            if masked:
                cm = cm_ref[:] if m_ops == 1 else cm_ref[:, _msl(mi)]
                mask_rw = cm * rw_ref[:]
            else:
                mask_rw = None
            for h, (q_ref, p_ref, dp_ref) in enumerate(
                    zip(q_refs, p_refs, dp_refs)):
                q = q_ref[:]
                p = p_ref[:] if m_ops == 1 else p_ref[:, _msl(mi)]
                draw, elem = _draw_tile(q, p, x, mask_rw, with_loss=True)
                draw = _dot_in(draw)
                total += jnp.sum(elem)
                dqt_blk = jax.lax.dot_general(
                    _dot_in(p), draw, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dqt_acc[h] = (dqt_blk if dqt_acc[h] is None
                              else dqt_acc[h] + dqt_blk)
                dp_blk = jax.lax.dot_general(
                    _dot_in(q), draw, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if m_ops == 1:
                    dp_ref[:] += dp_blk
                else:
                    dp_ref[:, _msl(mi)] += dp_blk
        for dq_ref, dqt_blk in zip(dq_refs, dqt_acc):
            @pl.when(j == 0)
            def _(dq_ref=dq_ref, dqt_blk=dqt_blk):
                dq_ref[i] = dqt_blk

            @pl.when(j > 0)
            def _(dq_ref=dq_ref, dqt_blk=dqt_blk):
                dq_ref[i] += dqt_blk
        loss_ref[0, 0] += total
    return kernel


def _dvt_kernel(no_missing, g_ops=1, m_ops=1):
    """Pass 3: dV^T = dXp^T X. Separate from pass 2 because dXp is the
    encoder VJP of pass 2's dq -- a true sequential dependency.

    Computed TRANSPOSED: a (TM, D) block with D=8 uses 8 of 128 lanes of
    every register and store; the (D, TM) layout is dense. The caller
    transposes the small (D, m_pad) result once outside.

    x is unpacked UNSCALED; the caller passes dXp already halved (one
    elementwise op on the tiny (B, D) array per call) -- bit-exact (see
    _unpack_x's scale docstring)."""
    def kernel(*refs):
        u_refs = refs[:g_ops]
        dxp_ref, dvt_ref = refs[g_ops:]

        @pl.when(pl.program_id(1) == 0)
        def _():
            dvt_ref[:] = jnp.zeros_like(dvt_ref)
        for mi in range(m_ops):
            x = _unpack_m(u_refs, mi, no_missing, scale=False, m_ops=m_ops)
            d = jax.lax.dot_general(
                _dot_in(dxp_ref[:]), _dot_in(x), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if m_ops == 1:
                dvt_ref[:] += d
            else:
                dvt_ref[:, _msl(mi)] += d
    return kernel


# --------------------------- pallas call wrappers --------------------------


def _q_specs(ks, tb, order="bm"):
    # index maps take *_ so the same specs serve the scalar-prefetch
    # (indexed) calls, whose maps are passed the block-id ref as a
    # trailing argument.
    if order == "bm":
        return [pl.BlockSpec((tb, k), lambda i, j, *_: (i, 0),
                             memory_space=pltpu.VMEM) for k in ks]
    return [pl.BlockSpec((tb, k), lambda j, i, *_: (i, 0),
                         memory_space=pltpu.VMEM) for k in ks]


def _p_specs(ks, order="bm", m_ops=1):
    if order == "bm":
        return [pl.BlockSpec((k, m_ops * TM), lambda i, j, *_: (0, j),
                             memory_space=pltpu.VMEM) for k in ks]
    return [pl.BlockSpec((k, m_ops * TM), lambda j, i, *_: (0, j),
                         memory_space=pltpu.VMEM) for k in ks]


INDEXED_TB_CAP = 256

# A head group at or below this size tiles at the SINGLE-head cap (400):
# the heavy kernels hold ~1M of scoped VMEM per head at tb=400 atop a
# shared base, and 9 heads overflow the 16M limit at 17.67M (fused.pick_tb
# measurements), so <=5 heads is the projected-safe fit. Validated by
# compilation at trace time -- an overflow fails loudly, not silently.
HEAD_GROUP_WIDE_HEADS = 5


def head_group_plan(n_heads: int) -> List[int]:
    """Trace-time head-group sizes for the heavy (draw-buffer) kernels.

    Multi-head programs cap the heavy-kernel batch tile at 256 because
    every head adds a (tb, TM)-scale draw buffer to scoped VMEM. Splitting
    the heads into S groups runs one heavy pallas call per group: each
    extra group re-reads the packed batch (+0.25 B/genotype of HBM) and
    re-unpacks it (the shared-unpack amortization shrinks), but a group of
    <= HEAD_GROUP_WIDE_HEADS heads tiles at the single-head cap 400 --
    a ~1.56x wider tile on the VPU-bound draw chain (VERDICT r4 #7).

    ``NA_TPU_HEAD_GROUPS=S`` (default 1 = one group, the status-quo
    all-heads-one-call program) is read at TRACE time like
    NA_TPU_TB_HEAVY. Returns contiguous balanced sizes over the sorted
    head keys (9 heads, S=2 -> [5, 4]). Grouping changes only float
    accumulation order (per-group loss partial sums; dp/loss tile extent
    400 vs 256), never the math -- pinned by tests/test_head_groups.py.
    """
    env = os.environ.get("NA_TPU_HEAD_GROUPS", "").strip()
    try:
        s = int(env) if env else 1
    except ValueError:
        raise ValueError(
            f"NA_TPU_HEAD_GROUPS must be an integer, got {env!r}") from None
    s = max(1, min(s, n_heads))
    base, extra = divmod(n_heads, s)
    return [base + (1 if i < extra else 0) for i in range(s)]


def _group_slices(sizes: List[int]) -> List[slice]:
    out, i = [], 0
    for s in sizes:
        out.append(slice(i, i + s))
        i += s
    return out


_M_VMEM_BUDGET = 40 << 20


def _buffers_bytes(n_heads: int, tbe: int, g_ops: int, m_ops: int) -> int:
    """Upper bound on a kernel call's scoped-VMEM stack: one (tbe, TM) f32
    buffer per (head, slab) draw plus per (g, slab) unpacked x. Mosaic
    does NOT reuse sequentially-dead buffers across the unrolled loops
    (measured: a 4-head tb=400 call allocates exactly 5 such buffers +
    24K, the anchor in _heavy_vmem_limit)."""
    return (n_heads + g_ops) * m_ops * tbe * TM * 4


def pick_m(nT: int, tbe: int, n_heads: int = 1, g_ops: int = 1) -> int:
    """Planar SNP tiles batched per grid step (the M analogue of pick_g).

    Per-pass cost on v5e is ~0.4-0.5 us FIXED per grid step plus a small
    per-DMA cost (PARITY round-2 grid-step cost model): one (m_ops, tb,
    TW) block -- m_ops consecutive planar tiles, contiguous chunks of the
    tile-major layout -- amortizes that fixed cost over m_ops tiles while
    keeping the DMA count unchanged. Largest divisor of nT (zero waste;
    ragged M edges never arise) at most the cap, whose draw/x buffer
    bound fits the 40M scoped-VMEM budget (_buffers_bytes; the allowance
    is raised per call by _heavy_vmem_limit).

    OPT-IN (default cap 1 = off): measured NEUTRAL end-to-end on v5e at
    the bench shape (nT=489 -> m_ops=3, grid steps cut 3x across all
    passes: 3 interleaved reps 98.2-103.5k samples/s m=1 vs 99.3-101.6k
    m=3, tools/ab_m_ops.py, PARITY round-5) -- the predicted ~0.5 ms/step
    fixed-cost saving does not materialize, so the historical program
    stays the default. NA_TPU_M_OPS=<cap> enables for A/B (0/1 = off),
    read at trace time; may win on other TPU generations or shapes."""
    env = os.environ.get("NA_TPU_M_OPS", "").strip()
    if env:
        try:
            cap = int(env)
        except ValueError:
            raise ValueError(
                f"NA_TPU_M_OPS must be an integer, got {env!r}") from None
        cap = max(1, cap)
    else:
        cap = 1
    best = 1
    for m in range(1, min(nT, cap) + 1):
        if nT % m == 0 and _buffers_bytes(n_heads, tbe, g_ops,
                                          m) <= _M_VMEM_BUDGET:
            best = m
    return best


def pick_g(nbk: int, blk: int, cap: int = INDEXED_TB_CAP) -> int:
    """Sampled blocks DMA'd per grid step in indexed (gather-free) mode.

    Per-pass cost on v5e is dominated by a ~0.4-0.5 us fixed cost per grid
    step plus a small per-DMA cost (tools/tune_gather3/4.py: 8.10 / 2.27 /
    1.38 ms at 24450 / 5868 / 2934 steps), so reading G blocks per step
    (one (g*blk)-row tile's worth) recovers the gathered program's
    grid-step count without materializing the gathered batch. G is the
    largest divisor of nbk with g*blk <= cap (VMEM/regalloc bound)."""
    best = 1
    for g in range(1, nbk + 1):
        if nbk % g == 0 and g * blk <= cap:
            best = g
    return best


def _u32_specs(tb, order="bm", indexed=False, g_ops=1, m_ops=1):
    """The packed-batch operand specs (g_ops of them when indexed).

    Plain mode: the gathered TILE-MAJOR (nT, B, TW) batch, each
    (m_ops, tb, TW) block -- m_ops consecutive planar tiles (pick_m),
    each tile's rows one contiguous DMA chunk (row-major (B, W4) layout
    reads 512-byte strided strips, capping HBM efficiency at ~8%% --
    measured in tools/tune_unpack.py). Indexed mode: the RESIDENT
    (nT, R, TW) array passed g_ops times; batch grid position i DMAs
    row-blocks idx[i*g_ops + m] (tb == sample_block, block-aligned),
    which the kernel concatenates into one (g_ops*tb)-row tile
    (m_ops == 1 there: the two batchings are exclusive)."""
    if indexed:
        if order == "bm":
            return [pl.BlockSpec(
                (1, tb, TW),
                (lambda i, j, idx, m=m: (j, idx[i * g_ops + m], 0)),
                memory_space=pltpu.VMEM) for m in range(g_ops)]
        return [pl.BlockSpec(
            (1, tb, TW),
            (lambda j, i, idx, m=m: (j, idx[i * g_ops + m], 0)),
            memory_space=pltpu.VMEM) for m in range(g_ops)]
    if order == "bm":
        return [pl.BlockSpec((m_ops, tb, TW), lambda i, j, *_: (j, i, 0),
                             memory_space=pltpu.VMEM)]
    return [pl.BlockSpec((m_ops, tb, TW), lambda j, i, *_: (j, i, 0),
                         memory_space=pltpu.VMEM)]


def _mask_specs(tb, order="bm", m_ops=1):
    """Specs for (col_mask, row_weight) -- masked variant only."""
    if order == "bm":
        return [
            pl.BlockSpec((1, m_ops * TM), lambda i, j, *_: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
    return [
        pl.BlockSpec((1, m_ops * TM), lambda j, i, *_: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, 1), lambda j, i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
    ]


def _heavy_vmem_limit(n_heads: int, tbe: int, g_ops: int, m_ops: int = 1):
    """Scoped-VMEM allowance for a heavy (draw-buffer) kernel call.

    Mosaic stack-allocates one (tbe, TM) f32 buffer per (head, slab) draw
    plus the per-(g, slab) unpacked x against a DEFAULT 16M scoped-vmem
    limit -- a compiler default, not hardware (v5e has 128M VMEM and this
    op's block operands/outputs are <2M per grid step). Measured anchor:
    a 4-head tb=400 call needs 16.41M, exactly _buffers_bytes + epsilon;
    the single-head tb=800 program that pick_tb's docstring recorded as
    failing at 20.05M compiles and runs once the allowance covers it.
    Returns None (use the default) when the estimate has comfortable
    margin, else 2x the estimate + 4M, capped at 100M (pick_m's 40M buffer
    budget keeps the doubled allowance under the cap with headroom --
    the tb=800 anchor shows true need can reach ~2.5x the bound).
    NA_TPU_VMEM_LIMIT_MB forces a specific allowance (0 = never raise).
    """
    env = os.environ.get("NA_TPU_VMEM_LIMIT_MB", "").strip()
    if env:
        try:
            mb = int(env)
        except ValueError:
            raise ValueError(
                f"NA_TPU_VMEM_LIMIT_MB must be an integer, got {env!r}"
            ) from None
        return mb << 20 if mb > 0 else None
    est = _buffers_bytes(n_heads, tbe, g_ops, m_ops)
    if est <= 12 << 20:
        return None
    return min(2 * est + (4 << 20), 100 << 20)


def _maybe_indexed_call(kernel, grid, in_specs, out_specs, out_shape,
                        cost_estimate, blk_idx, vmem_limit=None):
    """pallas_call dispatcher: plain grid, or scalar-prefetch with the
    (nbk,) block-id vector prepended as operand 0 (kernels take *refs or
    are wrapped, so the extra leading idx_ref is absorbed uniformly)."""
    params = (pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
              if vmem_limit else None)
    if blk_idx is None:
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, cost_estimate=cost_estimate,
            compiler_params=params, interpret=_interpret())

    def kernel_idx(idx_ref, *refs):
        return kernel(*refs)

    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
        out_specs=out_specs)
    call = pl.pallas_call(kernel_idx, grid_spec=spec, out_shape=out_shape,
                          cost_estimate=cost_estimate,
                          compiler_params=params, interpret=_interpret())
    return lambda *ops: call(blk_idx, *ops)


def _batch_geom(u32, tb, blk_idx):
    """(nB grid steps, tb_eff rows per step, g_ops, B rows, u32 operands).

    Plain mode: one contiguous (tb)-row block per step. Indexed: g =
    pick_g(nbk, blk) sampled blocks of ``tb`` rows per step."""
    if blk_idx is None:
        B = u32.shape[1]
        return B // tb, tb, 1, B, (u32,)
    nbk = blk_idx.shape[0]
    g = pick_g(nbk, tb)
    return nbk // g, tb * g, g, nbk * tb, (u32,) * g


def _xv_call(u32, V, tb, no_missing=False, blk_idx=None):
    nB, tbe, g, B, u_ops = _batch_geom(u32, tb, blk_idx)
    m_pad, D = V.shape
    mo = 1 if blk_idx is not None else pick_m(u32.shape[0], tbe, 1, g)
    # dense (D, TM) operand blocks (see _xv_kernel docstring), pre-halved:
    # the kernel unpacks RAW dosages and XLA fuses the 0.5 into this
    # transpose, saving one VPU multiply per genotype, bit-exact.
    vt = V.T * 0.5
    xpt = _maybe_indexed_call(
        _xv_kernel(no_missing, g, mo),
        grid=(nB, m_pad // (TM * mo)),
        in_specs=(_u32_specs(tb, "bm", blk_idx is not None, g, mo)
                  + [pl.BlockSpec((D, mo * TM), lambda i, j, *_: (0, j),
                                  memory_space=pltpu.VMEM)]),
        out_specs=pl.BlockSpec((1, D, tbe), lambda i, j, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nB, D, tbe), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * m_pad * D, bytes_accessed=B * m_pad // 4,
            transcendentals=0),
        blk_idx=blk_idx,
        # mo == 1 keeps the historical program (no allowance, fits 16M)
        vmem_limit=_heavy_vmem_limit(1, tbe, g, mo) if mo > 1 else None,
    )(*u_ops, vt)
    return xpt.transpose(0, 2, 1).reshape(B, D)


def _loss_call(qs, Ps, u32, cm2, rw2, tb, no_missing=False, masked=True,
               blk_idx=None):
    ks = [q.shape[1] for q in qs]
    nB, tbe, g, B, u_ops = _batch_geom(u32, tb, blk_idx)
    m_pad = u32.shape[0] * TM
    mo = 1 if blk_idx is not None else pick_m(u32.shape[0], tbe, len(ks), g)
    operands = ((*qs, *Ps, *u_ops, cm2, rw2) if masked
                else (*qs, *Ps, *u_ops))
    out = _maybe_indexed_call(
        _loss_kernel(len(ks), no_missing, masked, g, mo),
        grid=(nB, m_pad // (TM * mo)),
        in_specs=(_q_specs(ks, tbe)
                  + _p_specs(ks, m_ops=mo)
                  + _u32_specs(tb, "bm", blk_idx is not None, g, mo)
                  + (_mask_specs(tbe, m_ops=mo) if masked else [])),
        out_specs=pl.BlockSpec((1, 1), lambda i, j, *_: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * m_pad * (2 * sum(ks) + 8 * len(ks)),
            bytes_accessed=B * m_pad // 4,
            transcendentals=2 * B * m_pad * len(ks)),
        blk_idx=blk_idx,
        vmem_limit=_heavy_vmem_limit(len(ks), tbe, g, mo),
    )(*operands)
    return out[0, 0]


def _dq_dp_call(qs, Ps, u32, cm2, rw2, g, tb, no_missing=False, masked=True,
                blk_idx=None):
    ks = [q.shape[1] for q in qs]
    nB, tbe, g_ops, B, u_ops = _batch_geom(u32, tb, blk_idx)
    m_pad = u32.shape[0] * TM
    mo = (1 if blk_idx is not None
          else pick_m(u32.shape[0], tbe, len(ks), g_ops))
    g2 = jnp.asarray(g, jnp.float32).reshape(1, 1)
    operands = ((*qs, *Ps, *u_ops, cm2, rw2, g2) if masked
                else (*qs, *Ps, *u_ops, g2))
    outs = _maybe_indexed_call(
        _dq_dp_kernel(len(ks), no_missing, masked, g_ops, mo),
        grid=(m_pad // (TM * mo), nB),
        in_specs=(_q_specs(ks, tbe, "mb")
                  + _p_specs(ks, "mb", mo)
                  + _u32_specs(tb, "mb", blk_idx is not None, g_ops, mo)
                  + (_mask_specs(tbe, "mb", mo) if masked else [])
                  + [pl.BlockSpec((1, 1), lambda j, i, *_: (0, 0),
                                  memory_space=pltpu.SMEM)]),
        out_specs=([pl.BlockSpec((nB, k, tbe), lambda j, i, *_: (0, 0, 0),
                                 memory_space=pltpu.VMEM) for k in ks]
                   + [pl.BlockSpec((k, mo * TM), lambda j, i, *_: (0, j),
                                   memory_space=pltpu.VMEM) for k in ks]),
        out_shape=([jax.ShapeDtypeStruct((nB, k, tbe), jnp.float32)
                    for k in ks]
                   + [jax.ShapeDtypeStruct((k, m_pad), jnp.float32)
                      for k in ks]),
        cost_estimate=pl.CostEstimate(
            flops=B * m_pad * 6 * sum(ks), bytes_accessed=B * m_pad // 4,
            transcendentals=0),
        blk_idx=blk_idx,
        vmem_limit=_heavy_vmem_limit(len(ks), tbe, g_ops, mo),
    )(*operands)
    ks_n = len(ks)
    dqs = [o.transpose(0, 2, 1).reshape(B, k)
           for o, k in zip(outs[:ks_n], ks)]
    return dqs, outs[ks_n:]


def _loss_dq_dp_call(qs, Ps, u32, cm2, rw2, tb, no_missing=False,
                     masked=True, blk_idx=None):
    """(loss_sum, dqs, dps) in one packed read; dq/dp are UNSCALED (loss
    cotangent applied by the caller). See _loss_dq_dp_kernel."""
    ks = [q.shape[1] for q in qs]
    nB, tbe, g_ops, B, u_ops = _batch_geom(u32, tb, blk_idx)
    m_pad = u32.shape[0] * TM
    mo = (1 if blk_idx is not None
          else pick_m(u32.shape[0], tbe, len(ks), g_ops))
    operands = ((*qs, *Ps, *u_ops, cm2, rw2) if masked
                else (*qs, *Ps, *u_ops))
    outs = _maybe_indexed_call(
        _loss_dq_dp_kernel(len(ks), no_missing, masked, g_ops, mo),
        grid=(m_pad // (TM * mo), nB),
        in_specs=(_q_specs(ks, tbe, "mb")
                  + _p_specs(ks, "mb", mo)
                  + _u32_specs(tb, "mb", blk_idx is not None, g_ops, mo)
                  + (_mask_specs(tbe, "mb", mo) if masked else [])),
        out_specs=([pl.BlockSpec((1, 1), lambda j, i, *_: (0, 0),
                                 memory_space=pltpu.SMEM)]
                   + [pl.BlockSpec((nB, k, tbe), lambda j, i, *_: (0, 0, 0),
                                   memory_space=pltpu.VMEM) for k in ks]
                   + [pl.BlockSpec((k, mo * TM), lambda j, i, *_: (0, j),
                                   memory_space=pltpu.VMEM) for k in ks]),
        out_shape=([jax.ShapeDtypeStruct((1, 1), jnp.float32)]
                   + [jax.ShapeDtypeStruct((nB, k, tbe), jnp.float32)
                      for k in ks]
                   + [jax.ShapeDtypeStruct((k, m_pad), jnp.float32)
                      for k in ks]),
        cost_estimate=pl.CostEstimate(
            flops=B * m_pad * 6 * sum(ks), bytes_accessed=B * m_pad // 4,
            transcendentals=2 * B * m_pad * len(ks)),
        blk_idx=blk_idx,
        vmem_limit=_heavy_vmem_limit(len(ks), tbe, g_ops, mo),
    )(*operands)
    ks_n = len(ks)
    loss = outs[0][0, 0]
    dqs = [o.transpose(0, 2, 1).reshape(B, k)
           for o, k in zip(outs[1:1 + ks_n], ks)]
    return loss, dqs, outs[1 + ks_n:]


def _dv_call(u32, dXp, tb, no_missing=False, blk_idx=None):
    nB, tbe, g, B, u_ops = _batch_geom(u32, tb, blk_idx)
    m_pad = u32.shape[0] * TM
    D = dXp.shape[1]
    mo = 1 if blk_idx is not None else pick_m(u32.shape[0], tbe, 1, g)
    # the kernel unpacks RAW dosages; halve the tiny (B, D) cotangent once
    # here instead of scaling every unpacked genotype (bit-exact).
    dXp = dXp * 0.5
    dvt = _maybe_indexed_call(
        _dvt_kernel(no_missing, g, mo),
        grid=(m_pad // (TM * mo), nB),
        in_specs=(_u32_specs(tb, "mb", blk_idx is not None, g, mo)
                  + [pl.BlockSpec((tbe, D), lambda j, i, *_: (i, 0),
                                  memory_space=pltpu.VMEM)]),
        out_specs=pl.BlockSpec((D, mo * TM), lambda j, i, *_: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * m_pad * D, bytes_accessed=B * m_pad // 4,
            transcendentals=0),
        blk_idx=blk_idx,
        # mo == 1 keeps the historical program (no allowance, fits 16M)
        vmem_limit=_heavy_vmem_limit(1, tbe, g, mo) if mo > 1 else None,
    )(*u_ops, dXp)
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
    tb = pick_tb_wide(tiles_batch.shape[1])
    Xp = _xv_call(tiles_batch, params["V"], tb, no_missing)
    return qp.encode_from_xp(params, Xp)


# ------------------------------ the op --------------------------------------


def make_fused_training_loss(head_keys: List[str],
                             snp_axis: Optional[str] = None,
                             no_missing: bool = False,
                             masked: bool = True,
                             merged_loss: bool = False):
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
    (and ignored) so both variants share a call signature.

    ``merged_loss=True`` is the LOGGED-epoch program: the forward runs the
    merged loss+dq+dp kernel (the loss is a byproduct of the draw the
    backward needs anyway) and stashes the unscaled dq/dp as residuals, so
    a value_and_grad step costs 3 packed passes instead of 4. Gradients
    are bit-identical to the split program when the loss cotangent is 1.0
    (the engine's case); only the loss value's accumulation order changes
    (grid (nM, nB) instead of (nB, nM)). Do NOT use it for unlogged
    epochs: its loss computation cannot be dead-code-eliminated.

    NA_TPU_HEAD_GROUPS=S splits multi-head heavy calls into S per-group
    calls with wider batch tiles (head_group_plan)."""
    head_keys = sorted(head_keys)
    grp = _group_slices(head_group_plan(len(head_keys)))

    def _group_tb(B: int, sl: slice) -> int:
        n = sl.stop - sl.start
        if len(grp) == 1:
            return pick_tb(B, n)
        return pick_tb(B, n, cap=(_heavy_cap(1) if n <= HEAD_GROUP_WIDE_HEADS
                                  else None))

    def _pack_masks(col_mask, row_w):
        return col_mask.reshape(1, -1), row_w.reshape(-1, 1)

    def _encode(V, enc_params, u32):
        Xp = _xv_call(u32, V, pick_tb_wide(u32.shape[1]), no_missing)
        if snp_axis is not None:
            Xp = jax.lax.psum(Xp, snp_axis)
        return _encoder_apply(enc_params, Xp, head_keys), Xp

    def _forward(V, enc_params, Ps: Dict, u32, col_mask, row_w):
        B = u32.shape[1]
        qs, Xp = _encode(V, enc_params, u32)
        q_list = [qs[hk] for hk in head_keys]
        p_list = [Ps[hk] for hk in head_keys]
        cm2, rw2 = _pack_masks(col_mask, row_w)
        if merged_loss:
            loss, dq_list, dp_list = 0.0, [], []
            for sl in grp:
                l_g, dq_g, dp_g = _loss_dq_dp_call(
                    q_list[sl], p_list[sl], u32, cm2, rw2, _group_tb(B, sl),
                    no_missing, masked)
                loss += l_g
                dq_list += dq_g
                dp_list += list(dp_g)
            return loss, qs, Xp, dq_list, dp_list
        loss = 0.0
        for sl in grp:
            loss += _loss_call(q_list[sl], p_list[sl], u32, cm2, rw2,
                               _group_tb(B, sl), no_missing, masked)
        return loss, qs, Xp, None, None

    @jax.custom_vjp
    def fused_training_loss(V, enc_params, Ps, u32, col_mask, row_w):
        loss, qs, *_ = _forward(V, enc_params, Ps, u32, col_mask, row_w)
        return loss, qs

    def fwd(V, enc_params, Ps, u32, col_mask, row_w):
        loss, qs, Xp, dq_list, dp_list = _forward(
            V, enc_params, Ps, u32, col_mask, row_w)
        return (loss, qs), (enc_params, Ps, u32, col_mask, row_w, Xp,
                            dq_list, dp_list)

    def bwd(res, cts):
        g_loss, g_qs = cts
        enc_params, Ps, u32, col_mask, row_w, Xp, dq_list, dp_list = res
        B = u32.shape[1]

        qs, enc_vjp = jax.vjp(
            lambda ep, xp: _encoder_apply(ep, xp, head_keys), enc_params, Xp)

        if not merged_loss:
            cm2, rw2 = _pack_masks(col_mask, row_w)
            q_list = [qs[hk] for hk in head_keys]
            p_list = [Ps[hk] for hk in head_keys]
            dq_list, dp_list = [], []
            for sl in grp:
                dq_g, dp_g = _dq_dp_call(q_list[sl], p_list[sl], u32, cm2,
                                         rw2, g_loss, _group_tb(B, sl),
                                         no_missing, masked)
                dq_list += dq_g
                dp_list += list(dp_g)
            dPs = {hk: dp_list[i] for i, hk in enumerate(head_keys)}
        else:
            dPs = {hk: dp_list[i] * g_loss
                   for i, hk in enumerate(head_keys)}
        dqs = {hk: dq_list[i] * g_loss + g_qs[hk]
               for i, hk in enumerate(head_keys)}
        denc, dXp = enc_vjp(dqs)
        if snp_axis is not None:
            # True cotangent of this shard's Xp partial sums over the snp
            # shards that consumed the replicated psum result.
            dXp = jax.lax.psum(dXp, snp_axis)

        dV = _dv_call(u32, dXp, pick_tb_wide(u32.shape[1]), no_missing)
        return (dV, denc, dPs, None, None, None)

    fused_training_loss.defvjp(fwd, bwd)
    return fused_training_loss


def make_indexed_training_loss(head_keys: List[str], blk: int,
                               no_missing: bool = False,
                               merged_loss: bool = False):
    """Gather-free variant of make_fused_training_loss (single-device path).

    Signature: (V, enc_params, Ps, resident_u32, blk_idx) -> (loss, qs)
    where resident_u32 is the full tile-major (nT, R, TW) array and
    blk_idx a (nbk,) int32 vector of sampled ``blk``-row block ids. Every
    pass reads its batch blocks straight from the resident array via
    scalar-prefetch index maps -- the gathered batch is never
    materialized. Only for provably all-real batches (the engine's FULL
    batches): kernels run unmasked (see make_fused_training_loss's
    exactness argument; blocks are drawn from the first N rows only, so
    no padding rows appear)."""
    head_keys = sorted(head_keys)
    blk = int(blk)
    if blk > INDEXED_TB_CAP:
        # The heavy loss/dq_dp kernels take the sample block as their batch
        # tile; above the measured scoped-vmem cap the draw buffer fails
        # Mosaic compilation (fused.py tb=800 measurements) -- fail with
        # guidance instead of a compiler error deep in the first step.
        raise ValueError(
            f"--sample_block {blk} exceeds the indexed-path batch-tile cap "
            f"({INDEXED_TB_CAP}); use a smaller sample_block or unset "
            "NA_TPU_INDEXED.")

    def _forward(V, enc_params, Ps: Dict, u32, blk_idx):
        Xp = _xv_call(u32, V, blk, no_missing, blk_idx=blk_idx)
        qs = _encoder_apply(enc_params, Xp, head_keys)
        q_list = [qs[hk] for hk in head_keys]
        p_list = [Ps[hk] for hk in head_keys]
        if merged_loss:
            loss, dq_list, dp_list = _loss_dq_dp_call(
                q_list, p_list, u32, None, None, blk, no_missing,
                masked=False, blk_idx=blk_idx)
            return loss, qs, Xp, dq_list, dp_list
        loss = _loss_call(q_list, p_list, u32, None, None, blk,
                          no_missing, masked=False, blk_idx=blk_idx)
        return loss, qs, Xp, None, None

    @jax.custom_vjp
    def indexed_training_loss(V, enc_params, Ps, u32, blk_idx):
        loss, qs, *_ = _forward(V, enc_params, Ps, u32, blk_idx)
        return loss, qs

    def fwd(V, enc_params, Ps, u32, blk_idx):
        loss, qs, Xp, dq_list, dp_list = _forward(
            V, enc_params, Ps, u32, blk_idx)
        return (loss, qs), (enc_params, Ps, u32, blk_idx, Xp,
                            dq_list, dp_list)

    def bwd(res, cts):
        g_loss, g_qs = cts
        enc_params, Ps, u32, blk_idx, Xp, dq_list, dp_list = res

        qs, enc_vjp = jax.vjp(
            lambda ep, xp: _encoder_apply(ep, xp, head_keys), enc_params, Xp)

        if not merged_loss:
            q_list = [qs[hk] for hk in head_keys]
            p_list = [Ps[hk] for hk in head_keys]
            dq_list, dp_list = _dq_dp_call(q_list, p_list, u32, None, None,
                                           g_loss, blk, no_missing,
                                           masked=False, blk_idx=blk_idx)
            dPs = {hk: dp_list[i] for i, hk in enumerate(head_keys)}
        else:
            dPs = {hk: dp_list[i] * g_loss
                   for i, hk in enumerate(head_keys)}
        dqs = {hk: dq_list[i] * g_loss + g_qs[hk]
               for i, hk in enumerate(head_keys)}
        denc, dXp = enc_vjp(dqs)

        dV = _dv_call(u32, dXp, blk, no_missing, blk_idx=blk_idx)
        return (dV, denc, dPs, None, None)

    indexed_training_loss.defvjp(fwd, bwd)
    return indexed_training_loss
