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
    # alignments (U > T) contribute 0, not inf.
    per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)
    return per_seq.mean()
