"""Rotary position embedding tables + application.

Semantics match the reference (``gigaam/encoder.py:342-361``,
``gigaam/utils.py:83-100``): inverse-frequency table with base
``pos_emb_max_len``, ``emb = concat(freqs, freqs)``, rotate-half
``[-x2, x1]``.  The reference applies RoPE to the *pre-projection* input of
the attention block (``gigaam/encoder.py:244-250``) — we reproduce exactly
that in ``ops/attention.py``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def rotary_tables(length: int, dim: int, base: float) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute (cos, sin), each [length, dim], on host."""
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    t = np.arange(length, dtype=np.float64)
    freqs = np.outer(t, inv_freq)                       # [L, dim/2]
    emb = np.concatenate([freqs, freqs], axis=-1)       # [L, dim]
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """[-x2, x1] over the last dim (reference ``rtt_half``)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply RoPE to x [B, T, H, d] with tables cos/sin [T, d]."""
    cos = cos[None, :, None, :].astype(x.dtype)
    sin = sin[None, :, None, :].astype(x.dtype)
    return x * cos + rotate_half(x) * sin
