"""Fused self-attention Pallas kernel for the Conformer encoder.

Replaces the reference's flash-attn CUDA dependency
(``gigaam/encoder.py:258-274``, ``gigaam/utils.py:103-155``) with a
TPU-native design.  Speech-encoder sequences after 4x subsampling are short
(25 s audio -> T' = 625; VAD caps segments at 30 s -> T' <= 750), so the
*entire* K/V for one (batch, head) slice fits in VMEM.  The kernel therefore
streams query blocks against VMEM-resident K/V, computing
scores -> masked softmax -> @V entirely on-chip: the [T, T] score matrix
never touches HBM (the XLA fallback path materializes it per layer).

The rotary embedding is applied *before* the Q/K/V projections in this
architecture (reference quirk, ``gigaam/encoder.py:244-256``), so the kernel
is rope-free — plain masked SDPA.

Falls back to the XLA path when T exceeds the VMEM budget or when not on
TPU (`fused_attention_available`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports on TPU-enabled jaxlibs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

NEG_INF = -1e9
_MAX_VMEM_T = 2048  # K/V + score-block VMEM budget bound


def fused_attention_available(t: int) -> bool:
    return (_HAS_PLTPU and t <= _MAX_VMEM_T
            and jax.default_backend() not in ("cpu",))


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0]                                   # [blk_q, d]
    k = k_ref[0]                                   # [T, d]
    v = v_ref[0]
    mask = mask_ref[0]                             # [1, T] int8

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [blk_q, T]
    # Arithmetic masking (mask in {0,1}: +0 valid, NEG_INF invalid) instead
    # of a boolean select: broadcasting a [1, T] i1 vector trips a Mosaic
    # relayout error when T is not a multiple of the 128-lane tile.
    s = s + (mask.astype(jnp.float32) - 1.0) * (-NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _xla_mha(q, k, v, valid, scale):
    """XLA twin of ``_attn_kernel`` (same masking/softmax math) — used as
    the recompute target for the custom VJP below."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    mask = valid[:, None, None, :].astype(jnp.float32)
    s = s + (mask - 1.0) * (-NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return (o / denom).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_mha(q, k, v, valid, block_q, interpret):
    return _fused_mha_fwd_only(q, k, v, valid, block_q, interpret)


def _fused_mha_vjp_fwd(q, k, v, valid, block_q, interpret):
    out = _fused_mha_fwd_only(q, k, v, valid, block_q, interpret)
    return out, (q, k, v, valid)


def _fused_mha_vjp_bwd(block_q, interpret, res, g):
    # Backward = differentiate the mathematically identical XLA attention
    # (flash-style recompute: scores are cheap to rebuild, and a hand-rolled
    # Pallas backward is not worth it for T' <= 750 speech sequences).
    q, k, v, valid = res
    scale = 1.0 / math.sqrt(q.shape[-1])
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_mha(q_, k_, v_, valid, scale),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_fused_mha.defvjp(_fused_mha_vjp_fwd, _fused_mha_vjp_bwd)


def fused_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: jnp.ndarray,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked SDPA. q/k/v [B, H, T, d]; valid [B, T] bool -> [B, H, T, d].

    ``block_q=512`` measured ~10% faster than 256 at T'=501 (fewer grid
    cells; the kernel is cell-latency-bound, not softmax- or MXU-bound —
    an all-heads-per-cell variant measured *zero* further gain).

    Differentiable: forward runs the Pallas kernel; backward recomputes
    through an identical XLA formulation (``_xla_mha``), so the op works
    under ``jax.grad`` / ``jax.checkpoint`` in the train step.

    Output rows for invalid (padded) query positions are garbage, matching
    the XLA path's contract: the Conformer conv module re-zeroes padding
    before any cross-time mixing (``gigaam/encoder.py:396-409``).
    """
    return _fused_mha(q, k, v, valid, block_q, interpret)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _fused_mha_fwd_only(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: jnp.ndarray,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, t, d = q.shape
    # clamp the block to the lane-aligned sequence bound: a 512 block over a
    # T'=250 sequence would matmul ~2x padded query rows for nothing
    block_q = min(block_q, max(128, ((t + 127) // 128) * 128))
    scale = 1.0 / math.sqrt(d)
    bh = b * h
    qf = q.reshape(bh, t, d)
    kf = k.reshape(bh, t, d)
    vf = v.reshape(bh, t, d)
    # [B, 1, T]: TPU block shapes need the sublane dim to match the array
    mask8 = valid.astype(jnp.int8)[:, None, :]

    n_q = pl.cdiv(t, block_q)
    grid = (bh, n_q)
    kernel = functools.partial(_attn_kernel, scale=scale)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i, j: (i // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qf, kf, vf, mask8)
    return out.reshape(b, h, t, d)
