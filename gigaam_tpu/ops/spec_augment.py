"""SpecAugment: frequency + time masking in JAX with explicit RNG.

Matches torchaudio's ``FrequencyMasking``/``TimeMasking`` semantics used by
the reference (``train_utils/module.py:48-55,123-127``): mask width drawn
uniform in [0, param), start uniform in [0, size - width), zero fill,
applied ``n`` times per axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask_axis(
    key: jax.Array, feats: jnp.ndarray, axis_size: int, max_width: int,
    axis: int,
) -> jnp.ndarray:
    """Apply one random zero-mask along ``axis`` of feats [B, F, T]."""
    b = feats.shape[0]
    k1, k2 = jax.random.split(key)
    # torchaudio truncates the sampled floats to integers
    # (mask_along_axis_iid: ``value.long()`` / ``min_value.long()``), so
    # exactly floor(width) bins mask starting at an integer offset; the
    # start range uses the UN-truncated float width (min_value is drawn
    # over [0, size - value) before .long()), so both floors happen after
    # the draws — flooring width first would widen the start range by up
    # to one bin whenever the width has a fractional part
    width_f = jax.random.uniform(k1, (b,)) * max_width            # [B]
    width = jnp.floor(width_f)
    start = jnp.floor(jax.random.uniform(k2, (b,)) * (axis_size - width_f))
    idx = jnp.arange(axis_size)[None, :]                    # [1, S]
    mask = (idx >= start[:, None]) & (idx < (start + width)[:, None])
    shape = [b, 1, 1]
    shape[axis] = axis_size
    return jnp.where(mask.reshape(shape), 0.0, feats)


def spec_augment(
    key: jax.Array,
    feats: jnp.ndarray,
    freq_masks: int = 2,
    freq_width: int = 27,
    time_masks: int = 2,
    time_width: int = 20,
) -> jnp.ndarray:
    """feats [B, F, T] -> masked features (training-time augmentation)."""
    _, f, t = feats.shape
    keys = jax.random.split(key, freq_masks + time_masks)
    for i in range(freq_masks):
        feats = _mask_axis(keys[i], feats, f, freq_width, axis=1)
    for i in range(time_masks):
        feats = _mask_axis(keys[freq_masks + i], feats, t, time_width, axis=2)
    return feats
