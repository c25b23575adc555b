"""Small utilities (trainer/utils/misc.py + utils/misc.py equivalents)."""
from __future__ import annotations

import hashlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def move_batch_to_device(batch: Any, device=None, sharding=None) -> Any:
    """device_put a pytree of host arrays (move_batch_to_device,
    trainer/utils/misc.py:40-66)."""
    target = sharding if sharding is not None else device

    def put(x):
        if isinstance(x, (np.ndarray, jnp.ndarray)) or hasattr(x, "shape"):
            return jax.device_put(x, target)
        return x

    return jax.tree.map(put, batch)


def cast_batch_to_dtype(batch: Any, dtype=jnp.bfloat16) -> Any:
    """Cast floating leaves (cast_batch_to_half equivalent, bf16 on TPU)."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, batch)


def stable_hash(text: str) -> int:
    """Deterministic string hash (the reference hashes caption nouns for
    grounding dedup; python's hash() is salted per process)."""
    return int.from_bytes(hashlib.sha1(text.encode()).digest()[:8], "little")


class ExponentialSmoothing:
    """trainer/utils/misc.py:69-97 equivalent (kept for API parity)."""

    def __init__(self, alpha: float = 0.9):
        self.alpha = alpha
        self.value = None

    def update(self, x: float) -> float:
        self.value = x if self.value is None else \
            self.alpha * self.value + (1 - self.alpha) * x
        return self.value
