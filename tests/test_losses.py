"""Loss numerics: CTC vs torch.nn.CTCLoss, RNNT wavefront vs a numpy
forward-algorithm oracle, chunked joint vs full lattice, gradient sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gigaam_tpu.config import (  # noqa: E402
    RNNTDecoderConfig,
    RNNTHeadConfig,
    RNNTJointConfig,
)
from gigaam_tpu.models.heads import (  # noqa: E402
    init_rnnt_head,
    rnnt_joint_logits,
    rnnt_predict_sequence,
)
from gigaam_tpu.ops.ctc_loss import ctc_loss  # noqa: E402
from gigaam_tpu.ops.rnnt_loss import (  # noqa: E402
    rnnt_blank_emit_log_probs,
    rnnt_loss,
    rnnt_loss_from_log_probs,
)

RNG = np.random.default_rng(7)


def test_ctc_loss_matches_torch():
    b, t, v, u = 3, 12, 7, 5  # blank = 6
    logits = RNG.standard_normal((b, t, v)).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    targets = RNG.integers(0, v - 1, (b, u)).astype(np.int32)
    in_lens = np.array([12, 9, 7], dtype=np.int32)
    tgt_lens = np.array([5, 3, 2], dtype=np.int32)

    ref = torch.nn.CTCLoss(blank=v - 1, reduction="mean", zero_infinity=True)(
        log_probs.transpose(0, 1),
        torch.from_numpy(targets).long(),
        torch.from_numpy(in_lens).long(),
        torch.from_numpy(tgt_lens).long(),
    ).item()

    # normalized log-probs are accepted too (optax re-normalizes,
    # idempotently); the training path feeds raw logits
    ours = float(ctc_loss(
        jnp.asarray(np.asarray(log_probs)), jnp.asarray(in_lens),
        jnp.asarray(targets), jnp.asarray(tgt_lens), blank_id=v - 1))
    # exact torch reduction='mean' parity: per-sample totals divide by
    # target_length before the batch mean (the reference training recipe)
    np.testing.assert_allclose(ours, ref, atol=1e-4)

    ours_logits = float(ctc_loss(
        jnp.asarray(logits), jnp.asarray(in_lens),
        jnp.asarray(targets), jnp.asarray(tgt_lens), blank_id=v - 1))
    np.testing.assert_allclose(ours_logits, ref, atol=1e-4)

    # pad rows (input_length 0) drop out of the batch mean entirely
    in_pad = np.array([12, 9, 0], dtype=np.int32)
    tgt_pad = np.array([5, 3, 0], dtype=np.int32)
    ref2 = torch.nn.CTCLoss(blank=v - 1, reduction="mean",
                            zero_infinity=True)(
        log_probs[:2].transpose(0, 1),
        torch.from_numpy(targets[:2]).long(),
        torch.from_numpy(in_pad[:2]).long(),
        torch.from_numpy(tgt_pad[:2]).long(),
    ).item()
    ours2 = float(ctc_loss(
        jnp.asarray(logits), jnp.asarray(in_pad),
        jnp.asarray(targets), jnp.asarray(tgt_pad), blank_id=v - 1))
    np.testing.assert_allclose(ours2, ref2, atol=1e-4)

    # lengths beyond T clamp instead of defeating the feasibility gate
    long_lens = np.array([50, 50, 50], dtype=np.int32)
    ours3 = float(ctc_loss(
        jnp.asarray(logits), jnp.asarray(long_lens),
        jnp.asarray(targets), jnp.asarray(tgt_lens), blank_id=v - 1))
    assert np.isfinite(ours3) and ours3 < 1e4


def _numpy_rnnt_forward(blank_lp, emit_lp, t_len, u_len):
    """Textbook alpha recursion, per sample."""
    losses = []
    for bi in range(blank_lp.shape[0]):
        t_b, u_b = int(t_len[bi]), int(u_len[bi])
        alpha = np.full((t_b, u_b + 1), -np.inf)
        alpha[0, 0] = 0.0
        for t in range(t_b):
            for u in range(u_b + 1):
                if t == 0 and u == 0:
                    continue
                cands = []
                if t > 0:
                    cands.append(alpha[t - 1, u] + blank_lp[bi, t - 1, u])
                if u > 0:
                    cands.append(alpha[t, u - 1] + emit_lp[bi, t, u - 1])
                alpha[t, u] = np.logaddexp.reduce(cands)
        losses.append(-(alpha[t_b - 1, u_b] + blank_lp[bi, t_b - 1, u_b]))
    return np.array(losses)


def test_rnnt_wavefront_matches_numpy_oracle():
    b, t, u1 = 3, 9, 6
    blank_lp = np.log(RNG.uniform(0.05, 0.9, (b, t, u1))).astype(np.float32)
    emit_lp = np.log(RNG.uniform(0.05, 0.9, (b, t, u1))).astype(np.float32)
    emit_lp[:, :, -1] = -1e30  # no emission out of the last row
    t_len = np.array([9, 6, 4], dtype=np.int32)
    u_len = np.array([5, 3, 0], dtype=np.int32)

    ours = np.asarray(rnnt_loss_from_log_probs(
        jnp.asarray(blank_lp), jnp.asarray(emit_lp),
        jnp.asarray(t_len), jnp.asarray(u_len)))
    ref = _numpy_rnnt_forward(blank_lp, emit_lp, t_len, u_len)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def _tiny_head(v=6, h=8, d=10):
    cfg = RNNTHeadConfig(
        decoder=RNNTDecoderConfig(pred_hidden=h, pred_rnn_layers=1,
                                  num_classes=v),
        joint=RNNTJointConfig(enc_hidden=d, pred_hidden=h, joint_hidden=h,
                              num_classes=v))
    return init_rnnt_head(jax.random.PRNGKey(3), cfg), v, d


def test_chunked_blank_emit_matches_full_lattice():
    params, v, d = _tiny_head()
    blank = v - 1
    b, t, u = 2, 11, 4
    encoded = jnp.asarray(RNG.standard_normal((b, t, d)).astype(np.float32))
    targets = jnp.asarray(RNG.integers(0, blank, (b, u)).astype(np.int32))

    pred_out = rnnt_predict_sequence(params, targets)
    # full lattice reference
    logits = rnnt_joint_logits(params, encoded, pred_out)
    lp = jax.nn.log_softmax(logits, axis=-1)
    blank_ref = np.asarray(lp[..., blank])
    emit_ref = np.asarray(jnp.take_along_axis(
        lp[:, :, :u, :], targets[:, None, :, None], axis=-1)[..., 0])

    blank_lp, emit_lp = rnnt_blank_emit_log_probs(
        params, encoded, pred_out, targets, blank, time_chunk=4)
    np.testing.assert_allclose(np.asarray(blank_lp), blank_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(emit_lp)[:, :, :u], emit_ref,
                               atol=1e-5)
    assert (np.asarray(emit_lp)[:, :, u:] < -1e29).all()


def test_rnnt_loss_end_to_end_grad():
    params, v, d = _tiny_head()
    blank = v - 1
    b, t, u = 2, 10, 4
    encoded = jnp.asarray(RNG.standard_normal((b, t, d)).astype(np.float32))
    targets = jnp.asarray(RNG.integers(0, blank, (b, u)).astype(np.int32))
    t_len = jnp.asarray([10, 7])
    u_len = jnp.asarray([4, 2])

    def loss_fn(p, enc):
        return rnnt_loss(p, enc, targets, t_len, u_len, blank_id=blank,
                         time_chunk=4)

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, encoded)
    assert np.isfinite(float(loss)) and float(loss) > 0
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)

    # finite-difference check on one encoder element
    eps = 1e-3
    e2 = encoded.at[0, 3, 2].add(eps)
    e3 = encoded.at[0, 3, 2].add(-eps)
    fd = (float(loss_fn(params, e2)) - float(loss_fn(params, e3))) / (2 * eps)
    # loose smoke check: fp32 central differences carry ~1e-3 absolute
    # noise at this loss scale (the analytic grads are pinned exactly by
    # the numpy-oracle tests above)
    np.testing.assert_allclose(float(grads[1][0, 3, 2]), fd, rtol=2e-2,
                               atol=1e-3)


def test_rnnt_loss_longer_targets_than_frames():
    """U > T: impossible alignment must stay finite-safe upstream (the
    trainer clamps); here we just check T >= U+... works for T == U."""
    params, v, d = _tiny_head()
    blank = v - 1
    b, t, u = 1, 5, 5
    encoded = jnp.asarray(RNG.standard_normal((b, t, d)).astype(np.float32))
    targets = jnp.asarray(RNG.integers(0, blank, (b, u)).astype(np.int32))
    loss = rnnt_loss(params, encoded, targets, jnp.asarray([t]),
                     jnp.asarray([u]), blank_id=blank, time_chunk=8)
    assert np.isfinite(float(loss))


def test_rnnt_loss_masks_zero_length_rows():
    """Fixed-shape TPU batches carry empty pad rows (enc_len=0): they must
    not contribute to the batch-mean loss or its gradients (code-review
    r2 finding: they were silently clipped to 1 frame and scored)."""
    import jax
    import jax.numpy as jnp

    from gigaam_tpu.config import RNNTDecoderConfig, RNNTHeadConfig, RNNTJointConfig
    from gigaam_tpu.models.heads import init_rnnt_head
    from gigaam_tpu.ops.rnnt_loss import rnnt_loss

    v, d = 8, 12
    cfg = RNNTHeadConfig(
        decoder=RNNTDecoderConfig(pred_hidden=6, num_classes=v),
        joint=RNNTJointConfig(enc_hidden=d, pred_hidden=6, joint_hidden=6,
                              num_classes=v))
    params = init_rnnt_head(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((3, 10, d)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, v - 1, (3, 4)).astype(np.int32))

    full = rnnt_loss(params, enc, tgt,
                     jnp.asarray([10, 7, 0]), jnp.asarray([4, 2, 0]),
                     blank_id=v - 1)
    only_valid = rnnt_loss(params, enc[:2], tgt[:2],
                           jnp.asarray([10, 7]), jnp.asarray([4, 2]),
                           blank_id=v - 1)
    np.testing.assert_allclose(float(full), float(only_valid), rtol=1e-6)

    # gradients w.r.t. params are identical too (the pad row is inert)
    g_full = jax.grad(lambda p: rnnt_loss(
        p, enc, tgt, jnp.asarray([10, 7, 0]), jnp.asarray([4, 2, 0]),
        blank_id=v - 1))(params)
    g_valid = jax.grad(lambda p: rnnt_loss(
        p, enc[:2], tgt[:2], jnp.asarray([10, 7]), jnp.asarray([4, 2]),
        blank_id=v - 1))(params)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_valid)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
