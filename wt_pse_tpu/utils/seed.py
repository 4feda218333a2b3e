"""Determinism utilities.

The reference seeds python/numpy/torch and forces deterministic cuDNN
(``/root/reference/utils.py:58-65``). In JAX, all device randomness is explicit
PRNG-key threading (the train step derives every draw from one key), so
reproducibility is structural; this helper seeds the *host-side* generators used
for data loading order and any numpy-based preprocessing.
"""

from __future__ import annotations

import random

import numpy as np


def seed_initialization(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
