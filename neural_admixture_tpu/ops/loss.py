"""Losses with reference-matching numerics.

``clamped_bce_sum`` reproduces the reference's decoder-output clamp + summed
BCE training loss in one op:
  * decoder output is clamped to [0, 1]
    (/root/reference/neural_admixture/model/neural_admixture.py:97),
  * loss is torch.nn.BCELoss(reduction='sum') against X = genotype/2
    (/root/reference/neural_admixture/model/neural_admixture.py:288, :431).

Gradient semantics follow torch exactly rather than naive autodiff:
  * BCE forward clamps each log term at -100 (torch's log-clamp),
  * BCE backward is (rec - x) / max(rec * (1 - rec), 1e-12),
  * the [0,1] clamp passes gradient at the boundary (inclusive), like
    torch.clamp's backward.

Column masks (for SNP-axis padding) and row weights (for batch padding)
are folded into both the value and the gradient, so padded entries are
exact zeros in loss and grad.
"""
import jax
import jax.numpy as jnp

_LOG_CLAMP = -100.0
_GRAD_EPS = 1e-12


@jax.custom_vjp
def clamped_bce_sum(raw_rec, x, col_mask, row_weight):
    """sum over (B, M) of BCE(clip(raw_rec, 0, 1), x) * col_mask * row_weight.

    Args:
      raw_rec: (B, M) pre-clamp reconstruction (Q @ P).
      x: (B, M) targets in [0, 1] (dosage / 2, missing imputed to 0).
      col_mask: (M,) 1.0 for real SNP columns, 0.0 for padding.
      row_weight: (B,) 1.0 for real samples, 0.0 for padded batch rows.
    """
    loss, _ = _bce_fwd(raw_rec, x, col_mask, row_weight)
    return loss


def _bce_value(raw_rec, x, col_mask, row_weight):
    rec = jnp.clip(raw_rec, 0.0, 1.0)
    logr = jnp.maximum(jnp.log(rec), _LOG_CLAMP)
    log1mr = jnp.maximum(jnp.log1p(-rec), _LOG_CLAMP)
    elem = -(x * logr + (1.0 - x) * log1mr)
    elem = elem * col_mask[None, :] * row_weight[:, None]
    return jnp.sum(elem)


def _bce_fwd(raw_rec, x, col_mask, row_weight):
    loss = _bce_value(raw_rec, x, col_mask, row_weight)
    return loss, (raw_rec, x, col_mask, row_weight)


def _bce_bwd(res, g):
    # COTANGENT CONTRACT: only the reconstruction argument (argnum 0) is
    # differentiable; x, col_mask, and row_weight deliberately get ZERO
    # cotangents (their true gradients exist -- torch's BCELoss defines a
    # target gradient -- but genotypes/masks/weights are data, never
    # parameters, and the fused Pallas backward computes none of them).
    # Differentiating this loss wrt argnums >= 1 returns zeros, not the
    # mathematical gradient.
    raw_rec, x, col_mask, row_weight = res
    rec = jnp.clip(raw_rec, 0.0, 1.0)
    denom = jnp.maximum(rec * (1.0 - rec), _GRAD_EPS)
    drec = (rec - x) / denom
    inside = jnp.logical_and(raw_rec >= 0.0, raw_rec <= 1.0)
    draw = jnp.where(inside, drec, 0.0)
    draw = draw * col_mask[None, :] * row_weight[:, None] * g
    zeros_x = jnp.zeros_like(x)
    return (draw, zeros_x, jnp.zeros_like(col_mask), jnp.zeros_like(row_weight))


clamped_bce_sum.defvjp(_bce_fwd, _bce_bwd)


def softmax_cross_entropy_sum(logits, labels, row_weight):
    """torch.nn.CrossEntropyLoss(reduction='sum') equivalent.

    Note: the reference feeds the *softmaxed* Q probabilities into
    CrossEntropyLoss as if they were logits
    (/root/reference/neural_admixture/model/neural_admixture.py:472-473);
    callers reproduce that by passing probabilities here.
    """
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.sum((logz - picked) * row_weight)
