"""Torch-compatible multi-layer LSTM as a ``lax.scan`` cell.

Replaces the cuDNN LSTM behind the reference's RNNT prediction network
(``gigaam/decoder.py:83,101,136``).  Gate packing follows torch's
``[i, f, g, o]`` row order so converted ``weight_ih_l{k}`` / ``weight_hh_l{k}``
checkpoints drop in directly.

Weights layout per layer: ``w_ih`` [in, 4H], ``w_hh`` [H, 4H],
``b`` [4H] (= torch's ``b_ih + b_hh`` pre-summed by the converter).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp


def lstm_cell(
    p: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    h: jnp.ndarray,
    c: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step. x [B, in], h/c [B, H] -> (h', c')."""
    gates = (
        jnp.dot(x, p["w_ih"].astype(x.dtype),
                preferred_element_type=jnp.float32)
        + jnp.dot(h, p["w_hh"].astype(x.dtype),
                  preferred_element_type=jnp.float32)
        + p["b"].astype(jnp.float32)
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c.astype(jnp.float32) + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new.astype(x.dtype), c_new.astype(x.dtype)


def lstm_step_stacked(
    layers: List[Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    h: jnp.ndarray,
    c: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One step through L stacked layers. x [B, in]; h/c [L, B, H].

    Returns (top-layer output [B, H], h', c').
    """
    hs, cs = [], []
    inp = x
    for li, p in enumerate(layers):
        h_new, c_new = lstm_cell(p, inp, h[li], c[li])
        hs.append(h_new)
        cs.append(c_new)
        inp = h_new
    return inp, jnp.stack(hs), jnp.stack(cs)


def lstm_sequence(
    layers: List[Dict[str, jnp.ndarray]],
    xs: jnp.ndarray,
    h0: jnp.ndarray,
    c0: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run a full sequence. xs [B, T, in]; h0/c0 [L, B, H].

    Returns (outputs [B, T, H], hT, cT).  Time-major ``lax.scan`` keeps the
    recurrence on-device with static shapes (no cuDNN analogue needed).
    """
    xs_t = xs.transpose(1, 0, 2)  # [T, B, in]

    def step(carry, x_t):
        h, c = carry
        out, h, c = lstm_step_stacked(layers, x_t, h, c)
        return (h, c), out

    (hT, cT), outs = jax.lax.scan(step, (h0, c0), xs_t)
    return outs.transpose(1, 0, 2), hT, cT
