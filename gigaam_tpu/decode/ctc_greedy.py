"""CTC greedy decoding — fully vectorized on device.

Maps the reference's already array-oriented decode
(``gigaam/decoding.py:47-96``) onto jnp: argmax -> dedup mask
(labels[t] != labels[t-1]) -> length mask, then one host transfer extracts
per-sample (token_ids, frames).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def ctc_greedy_mask(
    log_probs: jnp.ndarray, lengths: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """log_probs [B, T, V] (blank = V-1), lengths [B] ->
    (labels [B, T], keep-mask [B, T])."""
    blank_id = log_probs.shape[-1] - 1
    labels = jnp.argmax(log_probs, axis=-1)
    t = labels.shape[1]
    prev = jnp.concatenate(
        [jnp.full_like(labels[:, :1], -1), labels[:, :-1]], axis=1)
    keep = (labels != blank_id) & (labels != prev)
    keep &= jnp.arange(t)[None, :] < jnp.clip(lengths, 0, t)[:, None]
    return labels, keep


def ctc_extract(
    labels: np.ndarray, keep: np.ndarray
) -> List[Tuple[List[int], List[int]]]:
    """Host-side: per sample (token_ids, token_frames)."""
    out = []
    for b in range(labels.shape[0]):
        frames = np.nonzero(keep[b])[0]
        out.append((labels[b, frames].tolist(), frames.tolist()))
    return out
