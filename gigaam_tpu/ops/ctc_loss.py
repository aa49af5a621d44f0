"""CTC loss (blank = num_classes - 1, matching the GigaAM head layout).

The reference uses ``nn.CTCLoss(blank=blank_id, zero_infinity=True)`` with
the default ``reduction='mean'`` (``train_utils/module.py:60,92-104``).  We
wrap ``optax.ctc_loss`` — an XLA-native alpha recursion — adapting the
padding conventions and mirroring torch's reduction: each sample's total
divides by its target length before averaging, so long utterances don't
dominate the gradient the way a plain per-sequence mean would.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def ctc_loss(
    logits: jnp.ndarray,
    input_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int,
) -> jnp.ndarray:
    """torch-``reduction='mean'`` CTC loss.

    logits [B, T, V] (raw head outputs; optax normalizes internally, so
    already-log-softmaxed inputs also work — just wastefully),
    input_lengths [B], targets [B, U] int32, target_lengths [B].

    Rows with input_length == 0 (static-shape pad rows) are masked out of
    the batch mean, matching ``rnnt_loss``'s contract.
    """
    b, t, _ = logits.shape
    u = targets.shape[1]
    # clamp to the actual frame axis: lengths beyond T would pass the
    # feasibility gate below while optax only sees T unpadded frames
    # (rnnt_loss clamps the same way)
    input_lengths = jnp.minimum(input_lengths, t)
    logit_paddings = (
        jnp.arange(t)[None, :] >= input_lengths[:, None]
    ).astype(jnp.float32)
    label_paddings = (
        jnp.arange(u)[None, :] >= target_lengths[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logits, logit_paddings, targets, label_paddings, blank_id=blank_id
    )
    # zero_infinity semantics (reference uses zero_infinity=True): impossible
    # alignments contribute 0, not a huge loss.  optax never returns inf —
    # it floors path log-probs at log_epsilon=-1e5 and hands back a finite
    # ~1e5 loss whose gradient would still blow up the batch — so gate on
    # CTC feasibility directly: a target fits iff
    # T >= U + #(consecutive repeats) (each repeat needs a separating
    # blank frame).
    in_len = jnp.arange(u)[None, :] < target_lengths[:, None]
    repeats = jnp.sum(
        (targets[:, 1:] == targets[:, :-1]) & in_len[:, 1:], axis=1)
    feasible = input_lengths >= target_lengths + repeats
    per_seq = jnp.where(feasible, per_seq, 0.0)
    # torch reduction='mean': divide each sample by its target length
    # (clamped at 1 — empty transcripts train pure blank emission), then
    # average over valid rows only
    per_seq = per_seq / jnp.maximum(target_lengths, 1)
    valid = (input_lengths > 0).astype(per_seq.dtype)
    return jnp.sum(per_seq * valid) / jnp.maximum(jnp.sum(valid), 1.0)
