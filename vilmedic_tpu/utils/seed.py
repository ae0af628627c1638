"""Run seeding and checkpoint-name seed recovery.

Parity with reference bin/utils.py:151-159 (random 6-digit seed seeding python/numpy
RNGs) and :17-20 (recovering the seed from a ``{tag}_{epoch}_{seed}`` checkpoint
name). On TPU, JAX randomness is functional: we derive a root ``jax.random.key``
from the same seed instead of mutating a global framework RNG.
"""

from __future__ import annotations

import os
import random
import re
from random import randrange

import numpy as np


def get_seed(seed=None) -> int:
    if seed is None:
        seed = randrange(100000, 999999)
    seed = int(seed)
    random.seed(seed)
    np.random.seed(seed)
    return seed


def jax_root_key(seed: int):
    import jax

    return jax.random.key(int(seed))


def extract_seed_from_ckpt(ckpt: str) -> str:
    """``1.68_10_560435.ckpt`` -> ``560435`` (reference bin/utils.py:17-20)."""
    assert os.path.exists(ckpt), f"{ckpt} does not exist"
    m = re.match(r".*_(.*?)\.(pth|ckpt|msgpack)$", os.path.basename(ckpt))
    assert m is not None, f"Cannot extract seed from {ckpt}"
    return m.group(1)
