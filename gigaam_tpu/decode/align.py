"""CTC forced alignment (Viterbi over the blank-interleaved target lattice).

Extension over the reference (which has no alignment surface): given audio
and a KNOWN transcript, find the most probable CTC path that emits exactly
that transcript, yielding per-token frames -> word timestamps + confidence.
Standard use cases: subtitle timing, corpus segmentation, keyword audit.

TPU-first design: the DP runs as one ``lax.scan`` over encoder frames with
a static state count S = 2*U_pad + 1 (targets pad to a bucket so the graph
is reused across transcripts); only the int8 backpointer table [T, S] and
the fp32 alpha rows [T, S] leave the device, and the O(T) backtrack is
host-side numpy.  States: even = blank, odd s = target token (s-1)//2; a
diagonal skip (s-2 -> s) is allowed only between distinct adjacent targets,
per the CTC topology (Graves 2006).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


def viterbi_align(
    log_probs: jnp.ndarray,
    enc_len: jnp.ndarray,
    targets: jnp.ndarray,
    target_len: jnp.ndarray,
    blank: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device-side Viterbi DP over the CTC alignment lattice.

    ``log_probs`` [T, V] fp32 (log-softmax over V incl. blank);
    ``targets`` [U_pad] int32 (entries >= ``target_len`` are padding);
    ``enc_len``/``target_len`` dynamic scalars.  Returns
    ``(bp [T, S] int8, final_state int32, score fp32)`` with S = 2*U_pad+1;
    ``score`` is the best complete-path log-prob (== NEG when the
    transcript cannot fit into ``enc_len`` frames).
    """
    t_max, _v = log_probs.shape
    u_pad = targets.shape[0]
    s = 2 * u_pad + 1
    s_idx = jnp.arange(s)
    is_odd = (s_idx % 2) == 1
    u_idx = jnp.clip((s_idx - 1) // 2, 0, max(u_pad - 1, 0))
    labels = jnp.where(is_odd, targets[u_idx], blank)           # [S]
    valid_state = s_idx <= 2 * target_len
    prev_u = jnp.clip(u_idx - 1, 0, max(u_pad - 1, 0))
    can_skip = is_odd & (s_idx >= 3) & (targets[u_idx] != targets[prev_u])

    emit = log_probs[:, labels]                                  # [T, S]
    emit = jnp.where(valid_state[None, :], emit, NEG)

    alpha0 = jnp.where(s_idx <= 1, emit[0], NEG)

    def body(alpha, emit_t):
        a1 = jnp.concatenate([jnp.full((1,), NEG, alpha.dtype), alpha[:-1]])
        a2 = jnp.where(
            can_skip,
            jnp.concatenate([jnp.full((2,), NEG, alpha.dtype), alpha[:-2]]),
            NEG)
        stacked = jnp.stack([alpha, a1, a2])                     # [3, S]
        bp_t = jnp.argmax(stacked, axis=0).astype(jnp.int8)
        new_alpha = jnp.max(stacked, axis=0) + emit_t
        # floor keeps long infeasible stretches from drifting to -inf*T
        new_alpha = jnp.maximum(new_alpha, NEG)
        return new_alpha, (bp_t, new_alpha)

    _, (bps, alphas) = jax.lax.scan(body, alpha0, emit[1:])
    bp = jnp.concatenate([jnp.zeros((1, s), jnp.int8), bps])     # [T, S]
    alphas = jnp.concatenate([alpha0[None], alphas])             # [T, S]

    last = jnp.clip(enc_len - 1, 0, t_max - 1)
    alpha_final = alphas[last]                                   # [S]
    end_a = 2 * target_len                                       # final blank
    end_b = jnp.maximum(2 * target_len - 1, 0)                   # final token
    score_a = alpha_final[end_a]
    score_b = jnp.where(target_len > 0, alpha_final[end_b], NEG)
    final_state = jnp.where(score_a >= score_b, end_a, end_b)
    score = jnp.maximum(score_a, score_b)
    # a path that merely survived the NEG floor is still infeasible
    score = jnp.where(score <= NEG / 2, NEG, score)
    return bp, final_state.astype(jnp.int32), score.astype(jnp.float32)


def backtrack(
    bp: np.ndarray,
    final_state: int,
    enc_len: int,
    n_targets: int,
    log_probs: Optional[np.ndarray] = None,
    targets: Optional[np.ndarray] = None,
) -> Tuple[List[int], Optional[List[float]]]:
    """Host-side O(T) walk of the backpointer table.

    Returns ``(first_frames [n_targets], mean_logps or None)`` where
    ``first_frames[u]`` is the frame at which the path ENTERS token u's
    state (the same first-emission semantics as the CTC greedy decoder)
    and ``mean_logps[u]`` averages the token's posterior over every frame
    the path occupies it (feeds Word.confidence).
    """
    first = [0] * n_targets
    sums = [0.0] * n_targets
    counts = [0] * n_targets
    state = int(final_state)
    for t in range(int(enc_len) - 1, -1, -1):
        if state % 2 == 1:
            u = (state - 1) // 2
            if u < n_targets:
                first[u] = t
                if log_probs is not None and targets is not None:
                    sums[u] += float(log_probs[t, int(targets[u])])
                    counts[u] += 1
        if t > 0:
            state -= int(bp[t, state])
    if log_probs is None or targets is None:
        return first, None
    logps = [sums[u] / counts[u] if counts[u] else NEG
             for u in range(n_targets)]
    return first, logps


def pad_targets(ids: List[int], bucket: int = 32) -> np.ndarray:
    """Pad token ids up to the next multiple of ``bucket`` (value 0 — the
    DP masks states beyond ``target_len``) so one compiled DP graph serves
    every transcript length in the bucket."""
    u = max(len(ids), 1)
    u_pad = ((u + bucket - 1) // bucket) * bucket
    out = np.zeros((u_pad,), np.int32)
    out[:len(ids)] = ids
    return out
