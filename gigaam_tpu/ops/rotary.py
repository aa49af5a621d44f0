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


def apply_rotary_wide(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, n_heads: int
) -> jnp.ndarray:
    """RoPE on the flat [B, T, H*d] layout (identical values to
    ``apply_rotary`` on the [B, T, H, d] view — pinned by test).

    The [B, T, H, 48] view puts only 48 of 128 lanes to work for every
    elementwise pass; staying in the 768-lane layout with head-tiled
    tables and one static lane gather for rotate-half measured 1.75 vs
    1.96 ms at b128 x T'=750 on a v5e (bitwise-equal outputs).
    """
    b, t, dd = x.shape
    d = dd // n_heads
    half = d // 2
    cos_w = jnp.tile(cos, (1, n_heads)).astype(x.dtype)        # [T, H*d]
    sin_w = jnp.tile(sin, (1, n_heads)).astype(x.dtype)
    block = np.concatenate([np.arange(half, d), np.arange(0, half)])
    perm = jnp.asarray(
        np.concatenate([block + d * i for i in range(n_heads)]))
    signs = jnp.asarray(
        np.tile(np.concatenate([-np.ones(half), np.ones(half)]), n_heads),
        x.dtype)
    return x * cos_w + x[..., perm] * (sin_w * signs)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply RoPE to x [B, T, H, d] with tables cos/sin [T, d]."""
    cos = cos[None, :, None, :].astype(x.dtype)
    sin = sin[None, :, None, :].astype(x.dtype)
    return x * cos + rotate_half(x) * sin
