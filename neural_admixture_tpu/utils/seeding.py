"""Deterministic seeding.

Mirrors reference ``utils.set_seed`` (/root/reference/neural_admixture/src/utils.py:97-112)
which seeds torch / numpy / random. JAX RNG is explicit (keys are threaded
through every stochastic function), so here we only seed the *host-side*
generators used by NumPy-based init paths.

Note this is nearly vestigial by design: the deterministic host streams
that matter (RSVD's Omega, the block-sampling pre-shuffle) construct their
own ``np.random.default_rng(seed)`` per call site, so reproducibility does
not depend on global-state seeding order. ``set_seed`` exists for CLI
parity and for any library code that still reads the legacy global RNGs.
"""
import random

import numpy as np


def set_seed(seed: int) -> None:
    np.random.seed(seed)
    random.seed(seed)
