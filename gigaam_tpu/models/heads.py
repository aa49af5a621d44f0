"""Model heads: CTC, RNNT (prediction network + joint), emotion classifier.

Re-designs of ``gigaam/decoder.py`` and the emo head
(``gigaam/model.py:262-293``) in functional JAX:

* CTC head — the reference's 1x1 Conv1d (``decoder.py:7-21``) is a plain
  matmul on TPU.
* RNNT prediction network — Embedding (padding_idx=blank keeps a zero row)
  + torch-compatible LSTM (``ops/lstm.py``).  The reference's
  ``predict(None)`` zero-vector BOS (``decoder.py:85-102``) equals embedding
  the blank id, since that row is zeros — our decode loop exploits this to
  stay dense on-device.
* RNNT joint — broadcast add [B,T,1,J] + [B,1,U,J] -> joint_net
  (``decoder.py:41-47``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..config import CTCHeadConfig, EmoHeadConfig, RNNTHeadConfig
from ..ops.conformer_ops import linear
from ..ops.lstm import lstm_sequence, lstm_step_stacked

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# CTC
# ---------------------------------------------------------------------------

def _init_proj_head(key: jax.Array, feat_in: int, num_classes: int) -> Params:
    """torch-style Linear init, shared by the CTC and emo heads."""
    bound = 1.0 / math.sqrt(feat_in)
    k1, k2 = jax.random.split(key)
    return {
        "proj": {
            "w": jax.random.uniform(k1, (feat_in, num_classes),
                                    jnp.float32, -bound, bound),
            "b": jax.random.uniform(k2, (num_classes,),
                                    jnp.float32, -bound, bound),
        }
    }


def init_ctc_head(key: jax.Array, cfg: CTCHeadConfig) -> Params:
    return _init_proj_head(key, cfg.feat_in, cfg.num_classes)


def ctc_log_probs(params: Params, encoded: jnp.ndarray) -> jnp.ndarray:
    """encoded [B, T, D] -> log_probs [B, T, V] (fp32 log-softmax)."""
    logits = linear(params["proj"], encoded).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1)


def ctc_logits(params: Params, encoded: jnp.ndarray) -> jnp.ndarray:
    return linear(params["proj"], encoded).astype(jnp.float32)


# ---------------------------------------------------------------------------
# RNNT
# ---------------------------------------------------------------------------

def init_rnnt_head(key: jax.Array, cfg: RNNTHeadConfig) -> Params:
    kd, kj = jax.random.split(key)
    dec, jnt = cfg.decoder, cfg.joint
    blank = dec.num_classes - 1

    # Embedding: torch init N(0,1), padding_idx row zeroed
    embed = jax.random.normal(jax.random.fold_in(kd, 0),
                              (dec.num_classes, dec.pred_hidden), jnp.float32)
    embed = embed.at[blank].set(0.0)

    layers: List[Params] = []
    h = dec.pred_hidden
    bound = 1.0 / math.sqrt(h)
    for li in range(dec.pred_rnn_layers):
        k = jax.random.fold_in(kd, 100 + li)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        layers.append({
            "w_ih": jax.random.uniform(k1, (h, 4 * h), jnp.float32, -bound, bound),
            "w_hh": jax.random.uniform(k2, (h, 4 * h), jnp.float32, -bound, bound),
            # torch keeps separate b_ih + b_hh, each U(-bound, bound); our
            # fused bias must be their SUM (triangular distribution), not a
            # single U(-2*bound, 2*bound) draw, which would double the
            # variance of the initial gate biases
            "b": (jax.random.uniform(k3, (4 * h,), jnp.float32, -bound, bound)
                  + jax.random.uniform(k4, (4 * h,), jnp.float32, -bound,
                                       bound)),
        })

    def lin(k, i, o):
        b = 1.0 / math.sqrt(i)
        k1, k2 = jax.random.split(k)
        return {"w": jax.random.uniform(k1, (i, o), jnp.float32, -b, b),
                "b": jax.random.uniform(k2, (o,), jnp.float32, -b, b)}

    return {
        "decoder": {"embed": embed, "lstm": layers},
        "joint": {
            "enc": lin(jax.random.fold_in(kj, 0), jnt.enc_hidden, jnt.joint_hidden),
            "pred": lin(jax.random.fold_in(kj, 1), jnt.pred_hidden, jnt.joint_hidden),
            "out": lin(jax.random.fold_in(kj, 2), jnt.joint_hidden, jnt.num_classes),
        },
    }


def rnnt_predict_step(
    params: Params, labels: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One prediction-network step. labels [B] int32; h/c [L, B, H].

    Embedding the blank id gives the zero vector (padding_idx), matching the
    reference's fresh-sample ``predict(None)`` path (``decoder.py:95-100``).
    """
    emb = params["decoder"]["embed"][labels]            # [B, H]
    return lstm_step_stacked(params["decoder"]["lstm"], emb, h, c)


def rnnt_predict_sequence(
    params: Params, tokens: jnp.ndarray
) -> jnp.ndarray:
    """Teacher-forced prediction net: tokens [B, U] -> outputs [B, U+1, H].

    Prepends the zero-vector BOS (reference ``train_utils/module.py:130-144``).
    """
    emb = params["decoder"]["embed"][tokens]            # [B, U, H]
    bos = jnp.zeros((emb.shape[0], 1, emb.shape[2]), emb.dtype)
    inp = jnp.concatenate([bos, emb], axis=1)           # [B, U+1, H]
    n_layers = len(params["decoder"]["lstm"])
    h0 = jnp.zeros((n_layers, emb.shape[0], emb.shape[2]), emb.dtype)
    out, _, _ = lstm_sequence(params["decoder"]["lstm"], inp, h0, h0)
    return out


def rnnt_joint_step(
    params: Params, enc_t: jnp.ndarray, pred: jnp.ndarray
) -> jnp.ndarray:
    """Single-frame joint: enc_t [B, D], pred [B, H] -> log_probs [B, V]."""
    j = params["joint"]
    x = linear(j["enc"], enc_t) + linear(j["pred"], pred)
    logits = linear(j["out"], jax.nn.relu(x)).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1)


def rnnt_joint_enc_proj(params: Params, encoded: jnp.ndarray) -> jnp.ndarray:
    """Hoisted encoder-side joint projection: [B, T, D] -> [B, T, J].

    One large MXU matmul before the greedy label loop, so each loop
    iteration only computes the predictor-side projection (the reference
    recomputes the encoder projection every step,
    ``gigaam/decoder.py:41-47`` via ``decoding.py:162``)."""
    return linear(params["joint"]["enc"], encoded)


def rnnt_joint_step_preproj(
    params: Params, enc_proj_t: jnp.ndarray, pred: jnp.ndarray
) -> jnp.ndarray:
    """Joint from a pre-projected encoder frame [B, J] + pred [B, H]."""
    j = params["joint"]
    x = enc_proj_t + linear(j["pred"], pred)
    logits = linear(j["out"], jax.nn.relu(x)).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1)


def rnnt_joint_logits(
    params: Params, encoded: jnp.ndarray, pred_out: jnp.ndarray
) -> jnp.ndarray:
    """Full lattice joint for training: [B,T,D] x [B,U+1,H] -> [B,T,U+1,V]."""
    j = params["joint"]
    enc = linear(j["enc"], encoded)[:, :, None, :]       # [B, T, 1, J]
    pred = linear(j["pred"], pred_out)[:, None, :, :]    # [B, 1, U+1, J]
    return linear(j["out"], jax.nn.relu(enc + pred))


# ---------------------------------------------------------------------------
# Emo
# ---------------------------------------------------------------------------

def init_emo_head(key: jax.Array, cfg: EmoHeadConfig) -> Params:
    return _init_proj_head(key, cfg.feat_in, cfg.num_classes)


def emo_probs(params: Params, encoded: jnp.ndarray,
              lengths: jnp.ndarray) -> jnp.ndarray:
    """Mean-pool over time + linear + softmax (``gigaam/model.py:272-285``).

    The reference avg-pools over the full (unmasked) T; we pool over valid
    frames only, which matches it exactly for unpadded single samples and is
    strictly more correct for padded batches.
    """
    t = encoded.shape[1]
    valid = (jnp.arange(t)[None, :] < lengths[:, None]).astype(encoded.dtype)
    # exact fp32 frame count: summing the bf16 mask would round counts
    # above 256 frames (30 s+ audio) and skew the mean pool
    count = jnp.minimum(lengths, t).astype(jnp.float32)[:, None]
    pooled = ((encoded * valid[:, :, None]).astype(jnp.float32).sum(axis=1)
              / jnp.maximum(count, 1.0))
    logits = linear(params["proj"], pooled).astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)
