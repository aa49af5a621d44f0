"""Multi-head self-attention variants for the Conformer encoder.

Re-designs of the reference attention stack (``gigaam/encoder.py:133-277``)
for XLA/TPU:

* ``rotary_mha`` — v3 path.  RoPE is applied to the *pre-projection* input
  for Q and K (faithful to ``gigaam/encoder.py:244-256``: the reference
  rotates ``x`` per-head before ``linear_q``/``linear_k``; V projects the
  un-rotated input).
* ``relpos_mha`` — v1/v2 Transformer-XL relative-position attention with the
  pad/reshape ``rel_shift`` trick (``gigaam/encoder.py:202-206``).

Masking: we carry a boolean *valid* mask [B, T] (True = real frame) and mask
pairwise-invalid score entries with a large negative constant before softmax.
The reference fills with -10000 / -inf depending on backend
(``gigaam/encoder.py:180-183,266-272``); a finite -1e9 gives identical valid
outputs while keeping padded query rows NaN-free.

Weights layout: Linear weights are stored [in, out] (``x @ w + b``); the
checkpoint converter transposes torch's [out, in].
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .conformer_ops import linear as _linear
from .rotary import apply_rotary_wide

NEG_INF = -1e9


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """[B, T, D] -> [B, H, T, d]"""
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, d] -> [B, T, D]"""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def _out_proj(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """Output projection straight off the [B, H, T, d] head layout.

    Folds the head merge-transpose into the matmul's contraction
    (bitwise-equal to ``_linear(p, _merge_heads(x))``): XLA absorbs the
    dimension permutation into the dot instead of materializing the
    transposed activation — 1.68 -> 1.22 ms at b128 x T'=750 on a v5e
    (the input-side split is already folded by XLA; only the merge side
    paid for a real relayout pass).
    """
    b, h, t, d = x.shape
    w = p["w"].reshape(h, d, -1).astype(x.dtype)
    y = jnp.einsum("bhtd,hdk->btk", x, w, preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _masked_softmax(
    scores: jnp.ndarray, valid: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """scores [B, H, Tq, Tk]; valid [B, T] -> softmax over Tk."""
    if valid is not None:
        pair = valid[:, None, None, :] & valid[:, None, :, None]
        scores = jnp.where(pair, scores, jnp.asarray(NEG_INF, scores.dtype))
    # fp32 softmax for stability regardless of activation dtype
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)


def rotary_mha(
    params: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    valid: Optional[jnp.ndarray],
    n_heads: int,
    use_fused: bool = False,
) -> jnp.ndarray:
    """Rotary self-attention. x [B, T, D]; cos/sin [T, d_head].

    ``use_fused`` routes the SDPA core through the Pallas VMEM-resident
    kernel (``ops/pallas_attention.py``) — our analogue of the reference's
    SDPA/flash backends (``gigaam/encoder.py:258-274``).
    """
    b, t, d = x.shape
    # flat-layout RoPE: full-lane elementwise + one static lane gather,
    # bitwise-equal to the [B, T, H, d_h] formulation (see rotary.py)
    xr = apply_rotary_wide(x, cos, sin, n_heads)

    q = _split_heads(_linear(params["linear_q"], xr), n_heads)
    k = _split_heads(_linear(params["linear_k"], xr), n_heads)
    v = _split_heads(_linear(params["linear_v"], x), n_heads)

    if use_fused:
        from .pallas_attention import fused_mha

        valid_b = (jnp.ones((b, t), jnp.bool_) if valid is None else valid)
        out = fused_mha(q, k, v, valid_b)
        return _out_proj(params["linear_out"], out)

    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    attn = _masked_softmax(scores, valid).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return _out_proj(params["linear_out"], out)


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift (``gigaam/encoder.py:202-206``).

    x: [B, H, Tq, P] with P = 2*Tq - 1 -> shifted [B, H, Tq, P].
    """
    b, h, q, p = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, p + 1, q)
    return x[:, :, 1:].reshape(b, h, q, p)


def relpos_mha(
    params: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    pos_emb: jnp.ndarray,
    valid: Optional[jnp.ndarray],
    n_heads: int,
    use_fused: bool = False,
) -> jnp.ndarray:
    """Relative-position self-attention (v1/v2).

    x [B, T, D]; pos_emb [2T-1, D] (positions T-1 .. -(T-1)).

    ``use_fused`` routes the whole score computation through the fused
    Pallas kernel (``ops/pallas_attention.py::fused_relpos_mha``): the
    positional matmul runs against the VMEM-resident projected position
    table and the rel-shift becomes an on-chip shear, so neither the
    [B,H,T,2T-1] positional term nor the [T,T] scores ever touch HBM
    (the shift's pad/reshape alone costs ~2.4 ms/layer in XLA at
    b8 x T'=512, chip-measured).
    """
    b, t, d = x.shape
    q = _split_heads(_linear(params["linear_q"], x), n_heads)   # [B,H,T,d]
    k = _split_heads(_linear(params["linear_k"], x), n_heads)
    v = _split_heads(_linear(params["linear_v"], x), n_heads)

    p = _linear(params["linear_pos"], pos_emb.astype(x.dtype))  # [P, D]
    p = p.reshape(-1, n_heads, d // n_heads).transpose(1, 0, 2)  # [H, P, d]

    bias_u = params["pos_bias_u"].astype(x.dtype)               # [H, d]
    bias_v = params["pos_bias_v"].astype(x.dtype)
    q_u = q + bias_u[None, :, None, :]
    q_v = q + bias_v[None, :, None, :]

    scale = 1.0 / math.sqrt(d // n_heads)

    if use_fused:
        from .pallas_attention import fused_relpos_mha

        valid_b = (jnp.ones((b, t), jnp.bool_) if valid is None else valid)
        out = fused_relpos_mha(q_u, k, v, q_v, p, valid_b)
        return _out_proj(params["linear_out"], out)

    matrix_bd = jnp.einsum("bhqd,hpd->bhqp", q_v, p,
                           preferred_element_type=jnp.float32)
    matrix_bd = rel_shift(matrix_bd)[..., :t]
    matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                           preferred_element_type=jnp.float32)
    scores = (matrix_ac + matrix_bd) * scale
    attn = _masked_softmax(scores, valid).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return _out_proj(params["linear_out"], out)
