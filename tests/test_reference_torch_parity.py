"""Whole-model parity against the reference's OWN torch implementation.

The strongest accuracy evidence obtainable offline: instantiate the actual
reference modules from ``/root/reference/gigaam`` (``encoder.py:605-647``,
``decoder.py:24-150``, ``decoding.py:47-207``) with random weights, push
the ``state_dict()`` through this repo's ``checkpoint.convert_state_dict``,
and require

  (a) encoder outputs allclose (fp32) on batched variable-length features,
  (b) identical greedy CTC and RNNT token ids, emit frames, and texts,
  (c) batched == single-sample behavior on both sides.

Per-op torch parity lives in ``test_op_parity.py``; this file closes the
gap from "every op matches" to "the whole 16-layer model + converter +
decoder stack matches the reference implementation" — so that when the
real checkpoints are reachable (``tests/test_golden.py``), the only
remaining variable is the weights themselves.

Scales covered: full v3 (16x768 rotary, conv2d subsampling) and a full
rel-pos config (v1/v2 attention family) at 16x768 with conv1d subsampling
so both subsampling converters are exercised end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gigaam_tpu.checkpoint import (
    config_from_reference,
    convert_state_dict,
    state_dict_to_numpy,
)
from gigaam_tpu.config import RU_VOCAB
from gigaam_tpu.decode.ctc_greedy import ctc_extract, ctc_greedy_mask
from gigaam_tpu.decode.rnnt_greedy import rnnt_extract, rnnt_greedy_decode
from gigaam_tpu.decode.tokenizer import Tokenizer
from gigaam_tpu.models.encoder import PosTables, conformer_forward
from gigaam_tpu.models.heads import ctc_log_probs

import reference_torch
from reference_torch import load_reference

import os

pytestmark = pytest.mark.skipif(
    not os.path.isdir(reference_torch.REF_DIR),
    reason="reference checkout not available")

V = len(RU_VOCAB) + 1  # 33 chars + blank = 34, the reference convention
PRED_HIDDEN = 320


def _ref_cfg_dict(attention: str, subsampling: str, n_layers: int,
                  d_model: int, n_heads: int, head_kind: str) -> dict:
    cfg = {
        "preprocessor": {"sample_rate": 16000, "features": 64},
        "encoder": {
            "feat_in": 64, "n_layers": n_layers, "d_model": d_model,
            "subsampling": subsampling, "self_attention_model": attention,
            "n_heads": n_heads,
        },
        "decoding": {"vocabulary": list(RU_VOCAB),
                     "max_symbols_per_step": 10},
    }
    if head_kind == "ctc":
        cfg["head"] = {"_target_": "gigaam.decoder.CTCHead",
                       "feat_in": d_model, "num_classes": V}
    else:
        cfg["head"] = {
            "_target_": "gigaam.decoder.RNNTHead",
            "decoder": {"pred_hidden": PRED_HIDDEN, "pred_rnn_layers": 1,
                        "num_classes": V},
            "joint": {"enc_hidden": d_model, "pred_hidden": PRED_HIDDEN,
                      "joint_hidden": PRED_HIDDEN, "num_classes": V},
        }
    return cfg


def _build(attention: str, subsampling: str, head_kind: str, seed: int,
           n_layers: int = 16, d_model: int = 768, n_heads: int = 16):
    """Reference torch modules (random init, eval) + our converted params."""
    ref = load_reference()
    torch.manual_seed(seed)
    enc = ref["encoder"].ConformerEncoder(
        feat_in=64, n_layers=n_layers, d_model=d_model,
        subsampling=subsampling, self_attention_model=attention,
        n_heads=n_heads, flash_attn=False)
    if head_kind == "ctc":
        head = ref["decoder"].CTCHead(feat_in=d_model, num_classes=V)
    else:
        head = ref["decoder"].RNNTHead(
            decoder={"pred_hidden": PRED_HIDDEN, "pred_rnn_layers": 1,
                     "num_classes": V},
            joint={"enc_hidden": d_model, "pred_hidden": PRED_HIDDEN,
                   "joint_hidden": PRED_HIDDEN, "num_classes": V})
    # pos_bias_u/v are allocated as raw torch.FloatTensor (reference
    # encoder.py:199-200) — uninitialized memory, NaN-prone.  Real
    # checkpoints overwrite them; for random-weight parity we must too.
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for name, p in enc.named_parameters():
            if "pos_bias" in name:
                p.uniform_(-0.5, 0.5, generator=g)
    enc.eval()
    head.eval()

    cfg = config_from_reference(
        _ref_cfg_dict(attention, subsampling, n_layers, d_model, n_heads,
                      head_kind), f"parity_{attention}_{head_kind}")
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"head.{k}": v for k, v in head.state_dict().items()})
    params = convert_state_dict(state_dict_to_numpy(sd), cfg)
    return ref, enc, head, cfg, params


def _features(seed: int, b: int = 3, t: int = 250):
    """Synthetic log-mel-like features [B, F, T] with variable lengths.

    Drawn at mel-output statistics (mean ~ -3, std ~ 4: log of a chi2-ish
    spectrum) rather than N(0,1) so the encoder sees realistic inputs, and
    the padded tail is set to log(1e-9) exactly like zero audio would
    produce (the value the subsampling re-mask exists to contain,
    reference ``encoder.py:92-109``).
    """
    rng = np.random.default_rng(seed)
    feats = (rng.standard_normal((b, 64, t)) * 4.0 - 3.0).astype(np.float32)
    lengths = np.linspace(t, max(t // 3, 8), b).astype(np.int32)
    lengths[0] = t
    for i, L in enumerate(lengths):
        feats[i, :, L:] = np.log(1e-9)
    return feats, lengths


def _our_encode(cfg, params, feats, lengths):
    """[B, F, T] torch-layout features -> (encoded [B, T', D], enc_len)."""
    x = jnp.asarray(feats).transpose(0, 2, 1)  # [B, T, F]
    tables = PosTables(cfg.encoder)
    from gigaam_tpu.ops.conformer_ops import static_subsampled_length

    t_sub = static_subsampled_length(
        feats.shape[2], cfg.encoder.num_subsampling_stages,
        cfg.encoder.subs_kernel_size)
    pos = (tables.rotary(t_sub)
           if cfg.encoder.self_attention_model == "rotary"
           else tables.relpos(t_sub))
    encoded, enc_len, _ = conformer_forward(
        params["encoder"], x, jnp.asarray(lengths), cfg.encoder, pos,
        compute_dtype=jnp.float32)
    return encoded, enc_len


CASES = [
    ("rotary", "conv2d"),   # v3 family
    ("rel_pos", "conv1d"),  # v1/v2 attention + the conv1d subsampling path
]


@pytest.mark.parametrize("attention,subsampling", CASES)
def test_full_scale_encoder_matches_reference(attention, subsampling):
    """16x768 encoder, batched variable-length input: fp32 allclose."""
    ref, enc, head, cfg, params = _build(attention, subsampling, "ctc",
                                         seed=0)
    feats, lengths = _features(seed=1)
    with torch.no_grad():
        ref_out, ref_len = enc(torch.from_numpy(feats),
                               torch.from_numpy(lengths))
    ours, our_len = _our_encode(cfg, params, feats, lengths)

    assert np.array_equal(np.asarray(our_len), ref_len.numpy())
    ref_np = ref_out.numpy().transpose(0, 2, 1)  # [B, T', D]
    ours_np = np.asarray(ours)
    # compare valid frames only (padded tails are unspecified garbage on
    # both sides past enc_len)
    scale = np.abs(ref_np).max()
    for i, L in enumerate(ref_len.tolist()):
        diff = np.abs(ours_np[i, :L] - ref_np[i, :L]).max()
        assert diff < 2e-3 * scale, (
            f"sample {i}: max|diff|={diff:.3e} vs scale {scale:.3e}")


@pytest.mark.parametrize("attention,subsampling", CASES)
def test_ctc_greedy_transcripts_match_reference(attention, subsampling):
    """Identical greedy CTC texts, token ids, and emit frames through the
    reference's own ``CTCGreedyDecoding`` vs our fused decode."""
    ref, enc, head, cfg, params = _build(attention, subsampling, "ctc",
                                         seed=2)
    feats, lengths = _features(seed=3)
    with torch.no_grad():
        ref_out, ref_len = enc(torch.from_numpy(feats),
                               torch.from_numpy(lengths))
        decoder = ref["decoding"].CTCGreedyDecoding(list(RU_VOCAB))
        ref_results = decoder.decode(head, ref_out, ref_len)

    ours, our_len = _our_encode(cfg, params, feats, lengths)
    log_probs = ctc_log_probs(params["head"], ours)
    labels, keep = ctc_greedy_mask(log_probs, our_len)
    pairs = ctc_extract(np.asarray(labels), np.asarray(keep))
    tok = Tokenizer(list(RU_VOCAB))

    assert any(len(r[1]) >= 3 for r in ref_results), (
        "vacuous test: random model emitted almost nothing")
    for i, (ref_text, ref_ids, ref_frames) in enumerate(ref_results):
        ids, frames = pairs[i]
        assert ids == ref_ids, f"sample {i} token ids diverge"
        assert frames == ref_frames, f"sample {i} emit frames diverge"
        assert tok.decode(ids) == ref_text


def test_rnnt_greedy_transcripts_match_reference():
    """Identical greedy RNNT texts/ids/frames: reference label-loop
    (``decoding.py:99-207``) vs our on-device while_loop."""
    ref, enc, head, cfg, params = _build("rotary", "conv2d", "rnnt", seed=4)
    feats, lengths = _features(seed=5)
    with torch.no_grad():
        ref_out, ref_len = enc(torch.from_numpy(feats),
                               torch.from_numpy(lengths))
        decoder = ref["decoding"].RNNTGreedyDecoding(list(RU_VOCAB))
        ref_results = decoder.decode(head, ref_out, ref_len)

    ours, our_len = _our_encode(cfg, params, feats, lengths)
    tokens, frames, counts = rnnt_greedy_decode(params["head"], ours,
                                                our_len)
    pairs = rnnt_extract(np.asarray(tokens), np.asarray(frames),
                         np.asarray(counts))
    tok = Tokenizer(list(RU_VOCAB))

    assert any(len(r[1]) >= 3 for r in ref_results), (
        "vacuous test: random model emitted almost nothing")
    for i, (ref_text, ref_ids, ref_frames) in enumerate(ref_results):
        ids, fr = pairs[i]
        assert ids == ref_ids, f"sample {i} token ids diverge"
        assert fr == ref_frames, f"sample {i} emit frames diverge"
        assert tok.decode(ids) == ref_text


def test_batch_invariance_matches_reference():
    """Single-sample forward == its row in the batched forward, on both
    sides, to the same tolerance (reference ``tests/test_batching.py``
    uses atol 0.03 on trained weights; random weights are tighter)."""
    ref, enc, head, cfg, params = _build("rotary", "conv2d", "ctc", seed=6,
                                         n_layers=4, d_model=256, n_heads=8)
    feats, lengths = _features(seed=7, b=3, t=200)
    with torch.no_grad():
        ref_b, ref_len = enc(torch.from_numpy(feats),
                             torch.from_numpy(lengths))
        i = 1  # a genuinely short sample inside a padded batch
        L = int(lengths[i])
        ref_s, _ = enc(torch.from_numpy(feats[i:i + 1, :, :L]),
                       torch.from_numpy(lengths[i:i + 1]))
    t_valid = int(ref_len[i])
    ref_delta = np.abs(ref_b.numpy()[i, :, :t_valid]
                       - ref_s.numpy()[0, :, :t_valid]).max()

    ours_b, our_len = _our_encode(cfg, params, feats, lengths)
    ours_s, _ = _our_encode(cfg, params, feats[i:i + 1, :, :L],
                            lengths[i:i + 1])
    our_delta = np.abs(np.asarray(ours_b)[i, :t_valid]
                       - np.asarray(ours_s)[0, :t_valid]).max()

    scale = np.abs(ref_b.numpy()).max()
    assert ref_delta < 0.01 * scale
    assert our_delta < 0.01 * scale


def test_rnnt_training_lattice_matches_reference():
    """Teacher-forced RNNT joint lattice (the training path): our
    rnnt_predict_sequence + rnnt_joint_logits must equal the reference
    fine-tuner's computation (``train_utils/module.py:130-144``: zero-
    vector BOS -> LSTM -> joint_net(enc + pred)) on the reference's own
    RNNTHead modules, at production dims."""
    ref = load_reference()
    torch.manual_seed(10)
    head = ref["decoder"].RNNTHead(
        decoder={"pred_hidden": PRED_HIDDEN, "pred_rnn_layers": 1,
                 "num_classes": V},
        joint={"enc_hidden": 768, "pred_hidden": PRED_HIDDEN,
               "joint_hidden": PRED_HIDDEN, "num_classes": V})
    head.eval()

    from gigaam_tpu.config import (RNNTDecoderConfig, RNNTHeadConfig,
                                   RNNTJointConfig)
    from gigaam_tpu.checkpoint import convert_head
    from gigaam_tpu.models.heads import (rnnt_joint_logits,
                                         rnnt_predict_sequence)

    cfg = RNNTHeadConfig(
        decoder=RNNTDecoderConfig(pred_hidden=PRED_HIDDEN,
                                  pred_rnn_layers=1, num_classes=V),
        joint=RNNTJointConfig(enc_hidden=768, pred_hidden=PRED_HIDDEN,
                              joint_hidden=PRED_HIDDEN, num_classes=V))
    sd = state_dict_to_numpy(
        {f"head.{k}": v for k, v in head.state_dict().items()})
    import jax
    params = jax.tree.map(jnp.asarray, convert_head(sd, cfg))

    rng = np.random.default_rng(11)
    b, t, u = 3, 12, 7
    encoded = rng.standard_normal((b, t, 768)).astype(np.float32)
    tokens = rng.integers(0, V - 1, (b, u)).astype(np.int32)

    with torch.no_grad():
        enc_t = torch.from_numpy(encoded)
        dec, jnt = head.decoder, head.joint
        bos = torch.zeros(b, 1, dec.pred_hidden)
        pred_out, _ = dec.lstm(
            torch.cat([bos, dec.embed(torch.from_numpy(tokens).long())],
                      dim=1).transpose(0, 1))
        ref_lattice = jnt.joint_net(
            jnt.enc(enc_t).unsqueeze(2)
            + jnt.pred(pred_out.transpose(0, 1)).unsqueeze(1)).numpy()

    pred = rnnt_predict_sequence(params, jnp.asarray(tokens))
    ours = np.asarray(rnnt_joint_logits(params, jnp.asarray(encoded), pred))
    assert ours.shape == (b, t, u + 1, V) == ref_lattice.shape
    np.testing.assert_allclose(ours, ref_lattice, atol=2e-5, rtol=1e-5)


def test_emo_head_matches_reference_pooling():
    """Emo path: encoder output -> avg-pool over T -> Linear -> softmax
    (reference ``gigaam/model.py:272-285``).  Our masked mean-pool equals
    the reference's full-T avg_pool1d on unpadded samples."""
    torch.manual_seed(12)
    lin = torch.nn.Linear(256, 4)
    lin.eval()

    from gigaam_tpu.config import EmoHeadConfig
    from gigaam_tpu.checkpoint import convert_head
    from gigaam_tpu.models.heads import emo_probs
    import jax

    sd = state_dict_to_numpy(
        {f"head.{k}": v for k, v in lin.state_dict().items()})
    params = jax.tree.map(
        jnp.asarray, convert_head(sd, EmoHeadConfig(feat_in=256,
                                                    num_classes=4)))

    rng = np.random.default_rng(13)
    enc = rng.standard_normal((1, 37, 256)).astype(np.float32)
    with torch.no_grad():
        # reference: encoded [B, D, T] -> avg_pool1d over full T
        pooled = torch.nn.functional.avg_pool1d(
            torch.from_numpy(enc.transpose(0, 2, 1)),
            kernel_size=37).squeeze(-1)
        ref_probs = torch.nn.functional.softmax(
            lin(pooled)[0], dim=-1).numpy()

    ours = np.asarray(emo_probs(params, jnp.asarray(enc),
                                jnp.asarray(np.array([37]))))[0]
    np.testing.assert_allclose(ours, ref_probs, atol=1e-6)
