"""The training engine.

TPU-native counterpart of the reference's NeuralAdmixture engine
(/root/reference/neural_admixture/model/neural_admixture.py:232-530):
fixed-epoch Adam training of the Q_P autoencoder with summed BCE (plus an
optionally weighted CE term in supervised mode), P clamped to [0, 1] after
every step, followed by a full-data sequential Q inference pass.

TPU-first design differences from the reference (semantics preserved):
  * the whole epoch runs as one jitted ``lax.scan`` over shuffled fixed-size
    batches (no DataLoader, no per-step dispatch); the final partial batch is
    padded and masked with zero row-weights;
  * batches are gathered from the 2-bit-packed resident genotype matrix and
    unpacked on the fly inside the step (no uint8 N x M matrix in HBM);
  * optimizer is optax.adam(b1=0.9, b2=0.95, eps=1e-8) -- same update rule as
    the reference's torch.optim.Adam(betas=(0.9, 0.95))
    (/root/reference/neural_admixture/model/neural_admixture.py:187-204);
  * the supervised_loss_weight flag is actually honored (the reference parses
    it but never forwards it, entry.py:40 vs model/train.py:131).
"""
import sys
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from tqdm.auto import tqdm

from ..models import qp
from ..ops.loss import clamped_bce_sum, softmax_cross_entropy_sum
from ..ops.pack import unpack_dosage_x
from ..utils.logger import log, setup_logging
from ..utils.metrics import fst_table

INFER_BATCH = 1024


@dataclass
class TrainConfig:
    epochs: int = 250
    batch_size: int = 800
    learning_rate: float = 20e-4
    seed: int = 42
    hidden_size: int = 1024
    n_components: int = 8
    supervised_loss_weight: float = 100.0
    ks: List[int] = field(default_factory=lambda: [3])
    log_every: int = 5
    progress: bool = True


def _loss_fn(params, packed_batch, row_weight, col_mask, pops_batch,
             supervised: bool, supervised_loss_weight: float):
    X = unpack_dosage_x(packed_batch)
    recs, qs = qp.forward_train(params, X)
    loss = jnp.asarray(0.0, jnp.float32)
    for hk in recs:
        loss = loss + clamped_bce_sum(recs[hk], X, col_mask, row_weight)
    if supervised:
        # Single-head supervised mode: CE over the (softmaxed) Q of the first
        # head, treated as logits -- faithful to the reference
        # (model/neural_admixture.py:460-474).
        hk0 = sorted(qs.keys())[0]
        loss = loss + supervised_loss_weight * softmax_cross_entropy_sum(
            qs[hk0], pops_batch, row_weight)
    return loss


def make_epoch_fn(tx, N: int, batch_size: int, supervised: bool,
                  supervised_loss_weight: float):
    """Build the jitted one-epoch function (scan over shuffled batches)."""
    nb = (N + batch_size - 1) // batch_size
    pad = nb * batch_size - N

    loss_fn = partial(_loss_fn, supervised=supervised,
                      supervised_loss_weight=supervised_loss_weight)

    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch_fn(params, opt_state, packed, col_mask, pops, key):
        perm = jax.random.permutation(key, N)
        if pad:
            perm = jnp.concatenate(
                [perm, jnp.full((pad,), N, dtype=perm.dtype)])
        idx = perm.reshape(nb, batch_size)

        def step(carry, idx_b):
            params, opt_state = carry
            row_weight = (idx_b < N).astype(jnp.float32)
            safe = jnp.minimum(idx_b, N - 1)
            xb = jnp.take(packed, safe, axis=0)
            pops_b = jnp.take(pops, safe, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, xb, row_weight, col_mask, pops_b)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = qp.restrict_P(params)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), idx)
        return params, opt_state, jnp.sum(losses)

    return epoch_fn


@partial(jax.jit, static_argnames=("n_real",))
def _infer_batch(params, packed_batch, n_real: int):
    X = unpack_dosage_x(packed_batch)
    return qp.forward_infer(params, X)


class NeuralAdmixtureTrainer:
    """Orchestrates init -> epochs -> Q inference -> results."""

    def __init__(self, cfg: TrainConfig, master: bool = True):
        setup_logging()
        self.cfg = cfg
        self.master = master
        self.ks = sorted(cfg.ks)

    def launch_training(self, P_init: np.ndarray, packed, V: np.ndarray,
                        M: int, N: int, pops: Optional[np.ndarray] = None
                        ) -> Tuple[List[np.ndarray], List[np.ndarray], Dict]:
        """Train and return (Qs, Ps, params).

        Args:
          P_init: (sum(ks), M) initial P rows (ascending K groups).
          packed: (N, W) uint8 2-bit packed genotypes (device or host).
          V: (D, M) RSVD projection (transposed to (M, D) trainable param).
          pops: optional (N,) int labels enabling supervised mode.
        """
        cfg = self.cfg
        packed = jnp.asarray(packed)
        m_pad = packed.shape[1] * 4
        col_mask = jnp.asarray(
            (np.arange(m_pad) < M).astype(np.float32))

        key = jax.random.PRNGKey(cfg.seed)
        key, k_init = jax.random.split(key)
        params = qp.init_params(k_init, np.asarray(V).T, P_init,
                                cfg.hidden_size, self.ks, m_pad=m_pad)

        tx = optax.adam(cfg.learning_rate, b1=0.9, b2=0.95, eps=1e-8)
        opt_state = tx.init(params)

        supervised = pops is not None
        pops_arr = jnp.asarray(pops if supervised else np.zeros(N),
                               dtype=jnp.int32)
        epoch_fn = make_epoch_fn(tx, N, min(cfg.batch_size, N), supervised,
                                 cfg.supervised_loss_weight)

        if self.master:
            log.info("")
            log.info("    Starting training...")
            log.info("")

        log_every = 2 if supervised else cfg.log_every
        epoch_iter = range(cfg.epochs)
        if cfg.progress and self.master:
            epoch_iter = tqdm(epoch_iter, desc="Epochs", file=sys.stderr)
        t_train = time.time()
        for epoch in epoch_iter:
            key, k_epoch = jax.random.split(key)
            params, opt_state, loss_sum = epoch_fn(
                params, opt_state, packed, col_mask, pops_arr, k_epoch)
            if self.master and epoch % log_every == 0:
                log.info(f"            Loss in epoch {epoch:3d} is "
                         f"{float(loss_sum):,.0f}")
        jax.block_until_ready(params)
        self.train_seconds = time.time() - t_train

        Qs = self._infer_q(params, packed, N)

        if self.master:
            log.info("")
            log.info("    Training finished!")
            log.info("")

        self.display_divergences(params, M)
        Ps = [np.asarray(params["decoders"][f"k{k}"]).T[:M].astype(np.float32)
              for k in self.ks]
        return Qs, Ps, params

    def _infer_q(self, params, packed, N: int) -> List[np.ndarray]:
        """Sequential full-data encoder pass at batch <= 1024
        (reference: model/neural_admixture.py:368-383)."""
        B = min(N, INFER_BATCH)
        chunks = {f"k{k}": [] for k in self.ks}
        for i in range(0, N, B):
            blk = packed[i:i + B]
            n_real = blk.shape[0]
            if n_real < B:
                pad = jnp.zeros((B - n_real, blk.shape[1]), blk.dtype)
                blk = jnp.concatenate([blk, pad], axis=0)
            qs = _infer_batch(params, blk, B)
            for hk in chunks:
                chunks[hk].append(np.asarray(qs[hk][:n_real]))
        return [np.concatenate(chunks[f"k{k}"], axis=0) for k in self.ks]

    def display_divergences(self, params, M: int) -> None:
        if not self.master:
            return
        for k in self.ks:
            P = np.asarray(params["decoders"][f"k{k}"]).T[:M]  # (M, k)
            log.info("    Results:")
            log.info(f"\n            Fst divergences between estimated "
                     f"populations: (K = {k})")
            log.info("")
            for line in fst_table(P):
                log.info(line)
            log.info("\n")
