"""RNNT greedy decoding — a single on-device ``lax.while_loop``.

The reference decode (``gigaam/decoding.py:99-207``) is host-driven: a
Python loop over frames with per-step ``.cpu()`` syncs, per-sample LSTM
state packing, and a shrinking active set.  That design serializes on
host<->device latency; on TPU we instead keep *per-sample frame pointers*
and run everything as one dense masked while_loop:

* every sample advances through its own (t, symbol-count) trajectory —
  trajectories are sample-independent, so results are identical to the
  reference's frame-synchronized loop;
* "fresh" samples need no special casing: the blank embedding row is zero
  (padding_idx) and the zero LSTM state equals torch's None state, which is
  exactly the reference's ``predict(None, None)`` path
  (``gigaam/decoder.py:95-100``);
* predictor state/label only advance on non-blank emissions, matching
  ``gigaam/decoding.py:168-179``;
* ``max_symbols_per_step`` (default 10) forces a frame advance, matching
  ``gigaam/decoding.py:189``.

Total iterations = max_b(T_b + U_b) instead of sum_t(max symbols at t) —
strictly fewer joint evaluations than the reference performs.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.heads import (
    rnnt_joint_enc_proj,
    rnnt_joint_step_preproj,
    rnnt_predict_step,
)


@partial(jax.jit, static_argnames=("max_symbols", "max_tokens",
                                   "with_logps"))
def rnnt_greedy_decode(
    params: Dict[str, Any],
    encoded: jnp.ndarray,
    enc_len: jnp.ndarray,
    max_symbols: int = 10,
    max_tokens: int = 0,
    with_logps: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """encoded [B, T, D], enc_len [B] ->
    (tokens [B, U_cap], frames [B, U_cap], counts [B]).

    ``with_logps=True`` appends a 4th output: the emitted token's joint
    log-prob per slot [B, U_cap] fp32 (word-confidence source) — opt-in so
    existing callers keep the 3-tuple and its compiled graph."""
    b, t_max, _ = encoded.shape
    blank = params["decoder"]["embed"].shape[0] - 1
    n_layers = len(params["decoder"]["lstm"])
    hidden = params["decoder"]["embed"].shape[1]
    u_cap = max_tokens if max_tokens > 0 else t_max * max_symbols
    # LSTM state must live in the predictor's param dtype: the cell returns
    # params-dtype outputs, and a while_loop carry may not change dtype
    # (encoded is often bf16 on TPU while the predictor runs fp32).
    state_dtype = params["decoder"]["embed"].dtype

    init = dict(
        t=jnp.zeros((b,), jnp.int32),
        sym=jnp.zeros((b,), jnp.int32),
        label=jnp.full((b,), blank, jnp.int32),
        h=jnp.zeros((n_layers, b, hidden), state_dtype),
        c=jnp.zeros((n_layers, b, hidden), state_dtype),
        tokens=jnp.zeros((b, u_cap), jnp.int32),
        frames=jnp.zeros((b, u_cap), jnp.int32),
        count=jnp.zeros((b,), jnp.int32),
    )
    if with_logps:
        init["logps"] = jnp.zeros((b, u_cap), jnp.float32)
    enc_len = jnp.clip(enc_len, 0, t_max)
    # hoist the encoder-side joint projection out of the loop: one big
    # [B,T,D]x[D,J] MXU matmul instead of a [B,D]x[D,J] matmul per step
    enc_proj = rnnt_joint_enc_proj(params, encoded.astype(jnp.float32))

    def cond(s):
        return jnp.any(s["t"] < enc_len)

    def step(s):
        active = s["t"] < enc_len
        t_safe = jnp.minimum(s["t"], t_max - 1)
        enc_t = jnp.take_along_axis(
            enc_proj, t_safe[:, None, None], axis=1)[:, 0, :]      # [B, J]
        pred, h_new, c_new = rnnt_predict_step(params, s["label"], s["h"], s["c"])
        # the in-loop log_softmax is argmax-invariant, but dropping it
        # measured ZERO chip-time win (docs/PERF.md loop-body findings),
        # so the shared helper stays
        logp = rnnt_joint_step_preproj(params, enc_t, pred)        # [B, V]
        k = jnp.argmax(logp, axis=-1).astype(jnp.int32)            # [B]

        emit = (k != blank) & active & (s["count"] < u_cap)
        # record emissions
        slot = jnp.minimum(s["count"], u_cap - 1)
        tokens = s["tokens"].at[jnp.arange(b), slot].set(
            jnp.where(emit, k, s["tokens"][jnp.arange(b), slot]))
        frames = s["frames"].at[jnp.arange(b), slot].set(
            jnp.where(emit, s["t"], s["frames"][jnp.arange(b), slot]))
        if with_logps:
            k_lp = jnp.take_along_axis(logp, k[:, None], axis=1)[:, 0]
            logps = s["logps"].at[jnp.arange(b), slot].set(
                jnp.where(emit, k_lp.astype(jnp.float32),
                          s["logps"][jnp.arange(b), slot]))
        count = s["count"] + emit.astype(jnp.int32)

        # predictor advances only on emission
        m = emit[None, :, None]
        h = jnp.where(m, h_new, s["h"])
        c = jnp.where(m, c_new, s["c"])
        label = jnp.where(emit, k, s["label"])

        # frame pointer: advance on blank/inactive, or when the symbol cap
        # for this frame is reached
        sym = jnp.where(emit, s["sym"] + 1, s["sym"])
        frame_done = (~emit) | (sym >= max_symbols)
        t = jnp.where(frame_done, s["t"] + 1, s["t"])
        sym = jnp.where(frame_done, 0, sym)

        new_s = dict(t=t, sym=sym, label=label, h=h, c=c,
                     tokens=tokens, frames=frames, count=count)
        if with_logps:
            new_s["logps"] = logps
        return new_s

    out = jax.lax.while_loop(cond, step, init)
    if with_logps:
        return out["tokens"], out["frames"], out["count"], out["logps"]
    return out["tokens"], out["frames"], out["count"]


def rnnt_extract(
    tokens: np.ndarray, frames: np.ndarray, counts: np.ndarray
) -> List[Tuple[List[int], List[int]]]:
    """Host-side: per sample (token_ids, token_frames)."""
    return [
        (tokens[i, : counts[i]].tolist(), frames[i, : counts[i]].tolist())
        for i in range(tokens.shape[0])
    ]
