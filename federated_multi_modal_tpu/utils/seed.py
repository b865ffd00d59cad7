"""Deterministic seeding across python/numpy (JAX PRNG keys are explicit)."""

import random

import numpy as np


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
