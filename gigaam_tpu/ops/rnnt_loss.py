"""RNN-Transducer loss, TPU-native.

The reference calls torchaudio's C++/CUDA ``rnnt_loss`` on a materialized
``[B, T, U+1, V]`` joint tensor, with host-side sub-batching to dodge int32
overflow and OOM (``train_utils/module.py:106-117,146-176``).  We avoid the
giant tensor altogether:

* ``rnnt_blank_emit_log_probs`` computes the joint in T-chunks under
  ``lax.map`` + ``jax.checkpoint``, immediately reducing each chunk's
  ``[B, tc, U+1, V]`` logits to the two numbers per lattice node the loss
  needs (blank log-prob, target-emit log-prob).  Peak memory is
  ``O(B * tc * U * V)`` for one chunk instead of the full lattice.
* ``rnnt_loss_from_log_probs`` runs the forward (alpha) recursion as an
  anti-diagonal wavefront scan — T+U steps of [B, U+1] vector work, fully
  vectorized, autodiff-able (backward = the beta lattice via XLA autodiff).

Semantics match torchaudio ``rnnt_loss(..., reduction="mean",
fused_log_softmax=True)``: log-softmax over V, sum of blank+emit path
log-probs, mean over batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def rnnt_blank_emit_log_probs(
    head_params: Dict[str, Any],
    encoded: jnp.ndarray,
    pred_out: jnp.ndarray,
    targets: jnp.ndarray,
    blank_id: int,
    time_chunk: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (blank_lp [B,T,U+1], emit_lp [B,T,U+1]) without keeping
    the [B,T,U+1,V] joint alive.

    encoded [B, T, D]; pred_out [B, U+1, H] (teacher-forced prediction net
    output incl. zero BOS); targets [B, U] (emit_lp[..., U] column is padded
    with NEG_INF — no emission past the last target).
    """
    from ..models.heads import rnnt_joint_logits

    b, t, _ = encoded.shape
    u1 = pred_out.shape[1]
    pad_t = (-t) % time_chunk
    enc = jnp.pad(encoded, ((0, 0), (0, pad_t), (0, 0)))
    n_chunks = enc.shape[1] // time_chunk
    enc_chunks = enc.reshape(b, n_chunks, time_chunk, -1).transpose(1, 0, 2, 3)

    tgt_idx = jnp.concatenate(
        [targets, jnp.full((b, 1), blank_id, targets.dtype)], axis=1
    )  # [B, U+1]; last column dummy (masked below)

    @jax.checkpoint
    def one_chunk(enc_c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logits = rnnt_joint_logits(head_params, enc_c, pred_out)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        blank_lp = lp[..., blank_id]                        # [B, tc, U+1]
        emit_lp = jnp.take_along_axis(
            lp, tgt_idx[:, None, :, None], axis=-1)[..., 0]  # [B, tc, U+1]
        return blank_lp, emit_lp

    blank_c, emit_c = jax.lax.map(one_chunk, enc_chunks)     # [n, B, tc, U+1]
    blank_lp = blank_c.transpose(1, 0, 2, 3).reshape(b, -1, u1)[:, :t]
    emit_lp = emit_c.transpose(1, 0, 2, 3).reshape(b, -1, u1)[:, :t]
    # no emission transition out of the last row (u = U)
    u_idx = jnp.arange(u1)[None, None, :]
    emit_lp = jnp.where(u_idx >= u1 - 1, NEG_INF, emit_lp)
    return blank_lp, emit_lp


def rnnt_loss_from_log_probs(
    blank_lp: jnp.ndarray,
    emit_lp: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Forward-algorithm RNNT loss from per-node transition log-probs.

    blank_lp/emit_lp [B, T, U+1]; logit_lengths [B] (valid T per sample);
    target_lengths [B] (valid U per sample).  Returns per-sample negative
    log-likelihood [B].

    alpha(t, u) = logaddexp(alpha(t-1, u) + blank(t-1, u),
                            alpha(t, u-1) + emit(t, u-1))
    loss = -(alpha(T-1, U) + blank(T-1, U))

    Scanned over anti-diagonals d = t + u: every cell of a diagonal depends
    only on diagonal d-1, so each step is one vectorized [B, U+1] update.
    Diagonal d holds v[u] = alpha(d-u, u).
    """
    b, t_max, u1 = blank_lp.shape

    u_vec = jnp.arange(u1)                                   # [U+1]
    u_range = u_vec[None, :]                                 # [1, U+1]

    def diag_gather(x: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
        """x [B, T, U+1] -> y[b, u] = x[b, d-u, u] (t clamped)."""
        t_idx = jnp.clip(d - u_vec, 0, t_max - 1)            # [U+1]
        return x[:, t_idx, u_vec]                            # [B, U+1]

    init = jnp.full((b, u1), NEG_INF)
    init = init.at[:, 0].set(0.0)                            # alpha(0, 0) = 0

    def step(v_prev: jnp.ndarray, d: jnp.ndarray):
        # v_prev[u] = alpha(d-1-u, u)
        blank_prev = diag_gather(blank_lp, d - 1)            # blank(d-1-u, u)
        from_t = v_prev + blank_prev                         # alpha(d-1-u,u)+blank
        # from u-1: alpha(d-u, u-1) + emit(d-u, u-1); v_prev[u-1] = alpha(d-u, u-1)
        emit_at_um1 = diag_gather(emit_lp, d - 1)            # emit((d-1)-(u), u) -> at index u-1 this is emit(d-u, u-1)
        from_u = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF),
             v_prev[:, :-1] + emit_at_um1[:, :-1]], axis=1)
        v = jnp.logaddexp(from_t, from_u)
        # cells outside the valid lattice region stay NEG_INF
        t_of_u = d - u_range                                 # [1, U+1]
        # (per-sample U bounds are NOT enforced here — the terminal gather
        # picks alpha at each sample's own target_length)
        valid = (t_of_u >= 0) & (t_of_u < t_max)
        v = jnp.where(valid, v, NEG_INF)
        return v, v

    n_diag = t_max + u1 - 1
    _, diags = jax.lax.scan(step, init, jnp.arange(1, n_diag))
    all_diags = jnp.concatenate([init[None], diags], axis=0)  # [D, B, U+1]

    # terminal: alpha(T_b - 1, U_b) + blank(T_b - 1, U_b)
    d_final = logit_lengths - 1 + target_lengths             # [B]
    alpha_final = all_diags[
        d_final, jnp.arange(b), target_lengths]              # [B]
    blank_final = blank_lp[
        jnp.arange(b), logit_lengths - 1, target_lengths]
    return -(alpha_final + blank_final)


@partial(jax.jit, static_argnames=("blank_id", "time_chunk"))
def rnnt_loss(
    head_params: Dict[str, Any],
    encoded: jnp.ndarray,
    targets: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int,
    time_chunk: int = 64,
) -> jnp.ndarray:
    """End-to-end RNNT loss (mean over batch) from encoder output.

    encoded [B, T, D]; targets [B, U]; runs the teacher-forced prediction
    net, chunked joint, and wavefront forward algorithm.
    """
    from ..models.heads import rnnt_predict_sequence

    pred_out = rnnt_predict_sequence(head_params, targets)
    blank_lp, emit_lp = rnnt_blank_emit_log_probs(
        head_params, encoded, pred_out, targets, blank_id, time_chunk)
    nll = rnnt_loss_from_log_probs(
        blank_lp, emit_lp,
        jnp.clip(logit_lengths, 1, encoded.shape[1]),
        jnp.clip(target_lengths, 0, targets.shape[1]))
    # zero-length (pad/dummy) samples have no valid alignment: mask them out
    # of the mean instead of scoring blank on a padding frame (fixed-shape
    # TPU batches legitimately carry such rows)
    valid = logit_lengths > 0
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1).astype(nll.dtype)
