"""Deterministic seeding.

Mirrors reference ``utils.set_seed`` (/root/reference/neural_admixture/src/utils.py:97-112)
which seeds torch / numpy / random. JAX RNG is explicit (keys are threaded
through every stochastic function), so here we only seed the *host-side*
generators used by NumPy-based init paths.
"""
import random

import numpy as np


def set_seed(seed: int) -> None:
    np.random.seed(seed)
    random.seed(seed)
