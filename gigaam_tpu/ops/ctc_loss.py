"""CTC loss (blank = num_classes - 1, matching the GigaAM head layout).

The reference uses ``nn.CTCLoss(blank=blank_id, zero_infinity=True)``
(``train_utils/module.py:60,92-104``).  We wrap ``optax.ctc_loss`` — an
XLA-native alpha recursion — adapting the padding conventions.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def ctc_loss(
    log_probs: jnp.ndarray,
    input_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int,
) -> jnp.ndarray:
    """Mean per-sample CTC loss.

    log_probs [B, T, V] (normalized), input_lengths [B],
    targets [B, U] int32, target_lengths [B].
    """
    b, t, _ = log_probs.shape
    u = targets.shape[1]
    logit_paddings = (
        jnp.arange(t)[None, :] >= input_lengths[:, None]
    ).astype(jnp.float32)
    label_paddings = (
        jnp.arange(u)[None, :] >= target_lengths[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        log_probs, logit_paddings, targets, label_paddings, blank_id=blank_id
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
    return per_seq.mean()
