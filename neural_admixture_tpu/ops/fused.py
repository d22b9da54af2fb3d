"""Shared in-kernel math for the fused Pallas training step (ops.fused_step).

The dominant per-step cost is everything that touches the (B, M) genotype
plane: the decode matmul Q @ P, the clamped BCE against X = dosage/2, their
gradients, and the PCA projection X @ V. The reference materializes the
uint8 batch, an f32 X, and an f32 reconstruction in device memory each step
(/root/reference/neural_admixture/model/neural_admixture.py:404-431,
pack2bit.cu:38-62). Here, every kernel (ops.fused_step) reads the *2-bit
packed* batch (uint32 words in planar order -- see ops.pack.planar_perm)
and unpacks in VMEM, so per step the M-plane HBM traffic is ~B*M/4 bytes
per kernel pass instead of >=12 B*M bytes.

This module holds exactly one implementation of the per-tile math those
kernels share -- unpack (:func:`_unpack_x`), BCE forward terms
(:func:`_bce_terms`), the BCE+clamp backward (:func:`_draw_tile`, with
torch-matching -100 log clamp, (rec-x)/max(rec(1-rec),1e-12) and
boundary-inclusive clamp mask) -- plus the tiling constants and backend
plumbing. The pallas_call wrappers (grids, block specs, custom VJP) live in
ops.fused_step, the single production op.

Tiles: TM = 2048 SNPs (= 128 u32 words = one lane row), TB sublanes chosen
from the batch size. M_pad must be a multiple of 2048 and B a multiple of TB.
"""
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pack import PLANAR_TILE

TM = PLANAR_TILE          # SNPs per tile
TW = TM // 16             # u32 words per tile
_LOG_CLAMP = -100.0
_GRAD_EPS = 1e-12

_INTERPRET_BY_BACKEND = {}


def _interpret() -> bool:
    """Pallas TPU kernels run interpreted on non-TPU backends (tests).

    Keyed on the current default backend (not cached unconditionally): the
    dryrun/bench helpers mutate the platform config at runtime, and a process
    that touched these ops early must not pin interpret mode forever."""
    backend = jax.default_backend()
    if backend not in _INTERPRET_BY_BACKEND:
        _INTERPRET_BY_BACKEND[backend] = backend not in ("tpu", "axon")
    return _INTERPRET_BY_BACKEND[backend]


_TB_WARNED = set()


def _heavy_cap(n_heads: int) -> int:
    # Multi-head keeps the 400 cap as long as the per-head draw buffers fit
    # the raised scoped-VMEM allowance with 2x headroom: the allowance is
    # min(2 * estimate + 4M, 100M) (fused_step._heavy_vmem_limit) and true
    # need has measured up to ~2.5x the (buffers * 400*TM*4) estimate (the
    # tb=800 anchor), so the cap stays 400 only while the DOUBLED estimate
    # fits the 100M ceiling -- (n+2) buffers (draws + x + mask_rw) of
    # 3.28M -> n <= 12 heads; beyond that fall back to the always-safe
    # 256 rather than risk a trace-time compile failure. The pre-round-5
    # 256 cap assumed the 16M default allowance was a wall; it is a
    # compiler default, and one call at tb=400 with the allowance raised
    # measured +4.7% over tb=200 at 9 heads (PARITY round-5).
    default = 400 if 2 * (n_heads + 2) * 400 * TM * 4 + (4 << 20) \
        <= 100 << 20 else 256
    env = os.environ.get("NA_TPU_TB_HEAVY", "").strip()
    if env:
        try:
            return int(env)
        except ValueError:
            raise ValueError(
                f"NA_TPU_TB_HEAVY must be an integer, got {env!r}") from None
    return default


def pad_batch_for_tiling(B: int, align: int, n_heads: int = 1,
                         d_sz: int = 1) -> int:
    """Smallest multiple of ``align`` >= B whose heavy-kernel batch tile is
    at least half the cap.

    Adversarial batch sizes (e.g. 808 = 8 x 101) have no large divisor
    that is a multiple of 8, so pick_tb degrades to tb=8 -- ~50x the
    grid-step fixed cost. The engine's per-row sampling already pads
    batches with zero-weight sentinel rows, so widening the pad to the
    next well-tiling size is free in semantics and recovers the
    throughput. ``d_sz``: the data-axis extent of the mesh -- the kernels
    tile the PER-DEVICE width B/d_sz under shard_map, so candidates are
    judged on that width (align must be a multiple of 8 * d_sz there).
    Returns the plain aligned round-up if no candidate within +cap
    per-device rows tiles well (pick_tb then warns)."""
    cap = _heavy_cap(n_heads)
    base = ((B + align - 1) // align) * align
    if base // d_sz <= cap or align % (8 * d_sz):
        return base
    # Candidate tiles stride down from the largest multiple of 8 at or
    # below the cap (a raw `range(cap, ..., -8)` would yield NO multiples
    # of 8 when an NA_TPU_TB_HEAVY override is not itself one, silently
    # disabling the padding optimization).
    cap8 = cap & ~7
    b = base
    while b // d_sz <= base // d_sz + cap:
        local = b // d_sz
        if local % 8 == 0 and any(local % tb == 0
                                  for tb in range(cap8, cap8 // 2 - 1, -8)):
            return b
        b += align
    return base


def pick_tb(B: int, n_heads: int = 1, cap: int = None) -> int:
    """Batch-tile cap for the HEAVY (draw-buffer) kernels (dq_dp / loss):
    largest divisor of B that is a multiple of 8 and <= the cap.

    Wider tiles cut the ~0.45 us/grid-step fixed cost but grow the in-VMEM
    (tb, TM) draw/x buffers, which Mosaic stack-allocates against a
    scoped-vmem allowance (16M by default; fused_step._heavy_vmem_limit
    raises it per call when the (heads+1)*tb*TM*4 buffer estimate needs it
    -- a compiler default, not hardware). Measured on v5e @1M SNPs, B=800
    (interleaved repeats): single-head cap 400 = 110.3-113.7k samples/s
    vs cap 256 = 87.9-107.1k (+8-13%); cap 800 measured SLOWER where it
    compiles (9-head 19.3k vs 21.2k at cap 400) -- the 6.5M-per-buffer
    tiles crowd out operand double-buffering. Multi-head ALSO caps at 400
    (one call, shared unpack, raised allowance): 21.2k vs 20.2k samples/s
    at 9 heads (+4.7%, PARITY round-5; the pre-round-5 256 cap treated
    the 16M default as a wall). Beyond 12 heads the allowance cap (100M)
    binds and the cap falls back to 256.

    NA_TPU_TB_HEAVY overrides both for A/B. The override is read at TRACE
    time: changing it mid-process has no effect on already-compiled
    programs (set it before the first jit of the step).

    A batch whose best tile is tiny (no large multiple-of-8 divisor, e.g.
    808 = 8 x 101 -> tb=8) pays ~cap/tb times the per-grid-step fixed
    cost; warns once per (B, cap) with the actionable fix (the engine
    pads per-row batches via pad_batch_for_tiling automatically).

    ``cap``: explicit cap override (still subject to the NA_TPU_TB_HEAVY
    env override) -- the head-grouped multi-head path passes the
    single-head cap for groups small enough to fit it in scoped VMEM
    (fused_step.head_group_plan)."""
    if cap is None or os.environ.get("NA_TPU_TB_HEAVY", "").strip():
        cap = _heavy_cap(n_heads)
    for tb in range(min(B, cap), 7, -1):
        if tb % 8 == 0 and B % tb == 0:
            if tb < cap // 4 and B > cap // 2 and (B, cap) not in _TB_WARNED:
                _TB_WARNED.add((B, cap))
                from ..utils.logger import log
                log.warning(
                    f"    Batch size {B} tiles poorly on the fused kernels "
                    f"(tile {tb}, cap {cap}): expect up to {cap // tb}x the "
                    f"per-tile dispatch overhead. Use a batch size with a "
                    f"large multiple-of-8 divisor (e.g. a multiple of "
                    f"{cap // 2}).")
            return tb
    raise ValueError(
        f"batch size {B} has no divisor that is a multiple of 8; "
        "pad the batch to a multiple of 8")


def pick_tb_wide(B: int) -> int:
    """Largest divisor of B that is a multiple of 8 and <= 1024.

    For the row-local xv/dv kernels: per-pass cost on v5e is dominated by
    a ~0.4-0.5 us fixed cost per grid step (tools/tune_gather4.py:
    gather+xv 1.86/1.64/1.57 ms at tb 200/400/800), so the light passes
    want the fewest, largest batch tiles the VMEM allows ((1, 1024, TW)
    u32 + (1, D, 1024) f32 blocks are ~0.5 MB). The heavy dq_dp/loss
    kernels keep pick_tb's smaller caps (400 single-head / 256 multi-head
    -- draw-buffer scoped-vmem pressure)."""
    for tb in range(min(B, 1024), 7, -1):
        if tb % 8 == 0 and B % tb == 0:
            return tb
    raise ValueError(
        f"batch size {B} has no divisor that is a multiple of 8; "
        "pad the batch to a multiple of 8")


def _unpack_x(u32_tile, no_missing: bool = False, scale: bool = True):
    """(TB, TW) uint32 -> (TB, TM) f32 dosage/2, missing -> 0 (planar order).

    Mosaic has no uint32->f32 cast; shift/mask in uint32, then go through
    int32 (values are in {0,1,2,3}, so the reinterpretation is exact).

    ``no_missing``: trace-time specialization when the host verified the
    packed matrix contains no code-3 genotypes (ops.pack.packed_has_missing)
    -- drops the compare+select, ~2 of the ~6 VPU ops per genotype in the
    unpack that dominates the kernels' critical path.

    ``scale=False`` returns the RAW dosage g instead of g/2 -- for the
    row-local xv/dv kernels, which use x only as a dot operand: folding
    the 0.5 into the kernel's SMALL operand (the (D, TM) V block / the
    (tb, D) dXp block) drops one VPU multiply per genotype and is
    BIT-EXACT, because both g/2 and v/2 are exact (integer halving /
    exponent decrement), so each product rounds once to the same
    g*v*0.5 either way. The dq_dp/loss kernels keep scale=True (their
    elementwise chain consumes x = g/2 directly)."""
    parts = [((u32_tile >> jnp.uint32(2 * b)) & jnp.uint32(3))
             for b in range(16)]
    g = jnp.concatenate(parts, axis=-1).astype(jnp.int32)  # (TB, TM)
    x = g.astype(jnp.float32)
    if scale:
        x = x * 0.5
    if no_missing:
        return x
    return jnp.where(g == 3, 0.0, x)


def _bce_terms(q, p, x, mask_rw):
    """Shared forward math for one tile. Returns (raw, rec, elementwise loss).

    ``mask_rw=None`` skips the mask multiply entirely (trace-time
    specialization for provably all-real batches -- see ops.fused_step's
    ``masked`` flag). Exact: padded SNP columns contribute exactly 0 anyway
    (padded P columns are 0 and stay 0 through training, padded packed bits
    decode to x=0, so x*logr = 0*(-100) = 0 and log1p(-0) = 0)."""
    raw = jnp.dot(_dot_in(q), _dot_in(p),
                  preferred_element_type=jnp.float32)
    rec = jnp.clip(raw, 0.0, 1.0)
    logr = jnp.maximum(jnp.log(rec), _LOG_CLAMP)
    log1mr = jnp.maximum(jnp.log1p(-rec), _LOG_CLAMP)
    elem = -(x * logr + (1.0 - x) * log1mr)
    if mask_rw is not None:
        elem = elem * mask_rw
    return raw, rec, elem


def _use_bf16_dots() -> bool:
    """Cast MXU dot operands to bf16 (f32 accumulation) in the fused
    kernels. Measured on v5e @800x1M, K=8: dq/dp BIT-IDENTICAL to the
    f32-operand program (the MXU reads f32 operands at bf16 precision at
    the default matmul precision anyway, so the explicit cast changes no
    math) and ~30% faster per dq_dp call -- halved operand VMEM traffic
    and single-pass-friendly layouts (tools/tune_bf16.py: 13.66 ->
    9.55 ms/call incl. dispatch). Default ON on TPU. Interpret mode keeps
    f32 operands: CPU matmuls are exact f32, so casting there WOULD
    change numerics. NA_TPU_DOT_BF16=0 forces f32 operands on TPU;
    =1 forces the cast even in interpret mode (tests pin the production
    branch with it)."""
    env = os.environ.get("NA_TPU_DOT_BF16")
    if env == "0":
        return False
    if env == "1":
        return True
    return not _interpret()


def _dot_in(x):
    """Operand cast for the MXU dots (see _use_bf16_dots)."""
    return x.astype(jnp.bfloat16) if _use_bf16_dots() else x


def _use_fast_recip() -> bool:
    """Approximate reciprocal in the BCE backward: measured 26% faster per
    backward pass on v5e with max 8e-6 relative gradient error
    (tools/tune_recip.py). NA_TPU_EXACT_DIV=1 forces exact division;
    NA_TPU_EXACT_DIV=0 forces the approx path even in interpret mode (used
    by tests to pin the production branch); unset -> approx on TPU, exact
    in interpret mode."""
    env = os.environ.get("NA_TPU_EXACT_DIV")
    if env == "1":
        return False
    if env == "0":
        return True
    return not _interpret()


def _draw_tile(q, p, x, mask_rw, with_loss=False):
    """d(loss)/d(raw) for one tile (torch BCE+clamp backward).

    ``mask_rw=None`` skips the mask multiply (all-real batches): padded SNP
    columns have raw = rec = x = 0, so (rec - x) = 0 makes the draw exactly 0
    there without masking.

    ``with_loss=True`` additionally returns the elementwise BCE loss (the
    decode matmul and clamp are computed once for both) -- the merged
    loss+dq+dp kernel for logged epochs; returns (draw, elem)."""
    raw = jnp.dot(_dot_in(q), _dot_in(p),
                  preferred_element_type=jnp.float32)
    rec = jnp.clip(raw, 0.0, 1.0)
    denom = jnp.maximum(rec * (1.0 - rec), _GRAD_EPS)
    if _use_fast_recip():
        drec = (rec - x) * pl.reciprocal(denom, approx=True)
    else:
        drec = (rec - x) / denom
    # In-range test as raw == rec (clip is the identity exactly on [0, 1]):
    # one compare instead of ge+le+and. NaN raws still yield 0 either way.
    draw = jnp.where(raw == rec, drec, 0.0)
    if mask_rw is not None:
        draw = draw * mask_rw
    if not with_loss:
        return draw
    logr = jnp.maximum(jnp.log(rec), _LOG_CLAMP)
    log1mr = jnp.maximum(jnp.log1p(-rec), _LOG_CLAMP)
    elem = -(x * logr + (1.0 - x) * log1mr)
    if mask_rw is not None:
        elem = elem * mask_rw
    return draw, elem
