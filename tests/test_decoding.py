"""Decoder tests: CTC greedy semantics, RNNT greedy vs a host-side oracle
reimplementation of the reference label-loop, tokenizer, timestamps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gigaam_tpu.config import RNNTDecoderConfig, RNNTHeadConfig, RNNTJointConfig
from gigaam_tpu.decode.ctc_greedy import ctc_extract, ctc_greedy_mask
from gigaam_tpu.decode.rnnt_greedy import rnnt_extract, rnnt_greedy_decode
from gigaam_tpu.decode.timestamps import compute_frame_shift, frames_to_words
from gigaam_tpu.decode.tokenizer import Tokenizer
from gigaam_tpu.models.heads import (
    init_rnnt_head,
    rnnt_joint_step,
    rnnt_predict_step,
)


def test_ctc_greedy_dedup_and_blank():
    # V=4, blank=3. Sequence: a a b blank b b -> a b b
    lp = np.full((1, 6, 4), -10.0, dtype=np.float32)
    path = [0, 0, 1, 3, 1, 1]
    for t, k in enumerate(path):
        lp[0, t, k] = 0.0
    labels, keep = ctc_greedy_mask(jnp.asarray(lp), jnp.asarray([6]))
    ids, frames = ctc_extract(np.asarray(labels), np.asarray(keep))[0]
    assert ids == [0, 1, 1]
    assert frames == [0, 2, 4]


def test_ctc_greedy_respects_length():
    lp = np.full((1, 5, 3), -10.0, dtype=np.float32)
    for t in range(5):
        lp[0, t, 0] = 0.0
    labels, keep = ctc_greedy_mask(jnp.asarray(lp), jnp.asarray([2]))
    ids, frames = ctc_extract(np.asarray(labels), np.asarray(keep))[0]
    assert frames == [0]  # dedup: single run; only frames < length survive
    assert ids == [0]


def _oracle_rnnt_decode(params, encoded, enc_len, max_symbols=10):
    """Host-side oracle of the reference label loop
    (``gigaam/decoding.py:128-207``): frame-synchronized, per-sample state."""
    b, t_max, _ = encoded.shape
    n_layers = len(params["decoder"]["lstm"])
    hidden = params["decoder"]["embed"].shape[1]
    blank = params["decoder"]["embed"].shape[0] - 1

    hyps = [[] for _ in range(b)]
    frames = [[] for _ in range(b)]
    label = [blank] * b
    h = [np.zeros((n_layers, 1, hidden), np.float32) for _ in range(b)]
    c = [np.zeros((n_layers, 1, hidden), np.float32) for _ in range(b)]

    for t in range(t_max):
        for bi in range(b):
            if t >= enc_len[bi]:
                continue
            for _ in range(max_symbols):
                pred, h_new, c_new = rnnt_predict_step(
                    params, jnp.asarray([label[bi]]),
                    jnp.asarray(h[bi]), jnp.asarray(c[bi]))
                logp = rnnt_joint_step(
                    params, jnp.asarray(encoded[bi: bi + 1, t]), pred)
                k = int(jnp.argmax(logp[0]))
                if k == blank:
                    break
                hyps[bi].append(k)
                frames[bi].append(t)
                label[bi] = k
                h[bi] = np.asarray(h_new)
                c[bi] = np.asarray(c_new)
    return hyps, frames


def test_rnnt_greedy_matches_oracle():
    v, hdim, d = 8, 12, 16
    cfg = RNNTHeadConfig(
        decoder=RNNTDecoderConfig(pred_hidden=hdim, pred_rnn_layers=1,
                                  num_classes=v),
        joint=RNNTJointConfig(enc_hidden=d, pred_hidden=hdim,
                              joint_hidden=hdim, num_classes=v))
    params = init_rnnt_head(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    encoded = rng.standard_normal((3, 11, d)).astype(np.float32) * 2.0
    enc_len = np.array([11, 7, 3], dtype=np.int32)

    tokens, frames, counts = rnnt_greedy_decode(
        params, jnp.asarray(encoded), jnp.asarray(enc_len))
    got = rnnt_extract(np.asarray(tokens), np.asarray(frames),
                       np.asarray(counts))

    exp_hyps, exp_frames = _oracle_rnnt_decode(params, encoded, enc_len)
    for bi in range(3):
        assert got[bi][0] == exp_hyps[bi], f"sample {bi} tokens differ"
        assert got[bi][1] == exp_frames[bi], f"sample {bi} frames differ"


def test_rnnt_greedy_max_symbols_cap():
    """With max_symbols=1 at most one token may be emitted per frame."""
    v, hdim, d = 6, 8, 8
    cfg = RNNTHeadConfig(
        decoder=RNNTDecoderConfig(pred_hidden=hdim, pred_rnn_layers=1,
                                  num_classes=v),
        joint=RNNTJointConfig(enc_hidden=d, pred_hidden=hdim,
                              joint_hidden=hdim, num_classes=v))
    params = init_rnnt_head(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    encoded = rng.standard_normal((2, 9, d)).astype(np.float32) * 3.0
    enc_len = np.array([9, 9], dtype=np.int32)

    tokens, frames, counts = rnnt_greedy_decode(
        params, jnp.asarray(encoded), jnp.asarray(enc_len), max_symbols=1)
    for bi in range(2):
        fr = np.asarray(frames)[bi, : int(counts[bi])]
        assert len(fr) == len(set(fr.tolist()))  # one emission per frame

    exp_hyps, exp_frames = _oracle_rnnt_decode(params, np.asarray(encoded),
                                               enc_len, max_symbols=1)
    got = rnnt_extract(np.asarray(tokens), np.asarray(frames),
                       np.asarray(counts))
    for bi in range(2):
        assert got[bi][0] == exp_hyps[bi]


def test_charwise_tokenizer():
    vocab = [" ", "а", "б", "в"]
    tok = Tokenizer(vocab)
    assert len(tok) == 4
    assert tok.decode([1, 2, 0, 3]) == "аб в"
    assert tok.encode("аб в") == [1, 2, 0, 3]
    assert tok.id_to_str(2) == "б"


def test_frames_to_words_charwise():
    vocab = [" ", "п", "р", "и", "в", "е", "т", "м"]
    tok = Tokenizer(vocab)
    # "привет мир"-style: two words split by the space token
    ids = [1, 2, 3, 4, 5, 6, 0, 7, 3, 2]
    frames = [0, 1, 2, 3, 4, 5, 6, 8, 9, 10]
    shift = compute_frame_shift(16000, 12)  # 1 s / 12 frames
    words = frames_to_words(tok, ids, frames, shift)
    assert [w.text for w in words] == ["привет", "мир"]
    assert words[0].start == 0.0
    np.testing.assert_allclose(words[0].end, 6 * shift, atol=1e-9)
    np.testing.assert_allclose(words[1].start, 8 * shift, atol=1e-9)
    np.testing.assert_allclose(words[1].end, 11 * shift, atol=1e-9)


def test_sp_id_to_str_consistent_with_decode(tmp_path):
    """Control pieces render as '' and unk as the same glyph decode emits —
    raw '<s>'/'<unk>' must not leak into word timestamps."""
    from test_export_serve import _write_tiny_sp_model

    from gigaam_tpu.decode.timestamps import frames_to_words

    path = str(tmp_path / "tok.model")
    # types: 1=normal, 2=unknown, 3=control
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
              ("▁аб", -0.5, 1), ("ва", -0.7, 1)]
    _write_tiny_sp_model(path, pieces)
    tok = Tokenizer([], path)
    assert tok.id_to_str(1) == "" and tok.id_to_str(2) == ""
    assert tok.id_to_str(0) == "⁇"
    assert tok.id_to_str(3) == "▁аб"

    # control tokens contribute neither text nor frames to words
    ids, frames = [1, 3, 4, 2], [0, 1, 2, 3]
    words = frames_to_words(tok, ids, frames, frame_shift=0.1)
    assert [w.text for w in words] == ["абва"]
    assert words[0].start == pytest.approx(0.1)
    assert words[0].end == pytest.approx(0.3)
    # decode agrees: controls dropped from the transcript too
    assert tok.decode(ids) == "абва"


def test_sp_byte_fallback_encode_decode(tmp_path):
    """Models with --byte_fallback pieces: OOV spans encode to UTF-8 byte
    pieces (real sentencepiece's byte-fallback post-step, pinned exactly by
    the gated test_sp_parity.py), and decode merges byte runs back to text."""
    from test_export_serve import _write_tiny_sp_model

    from gigaam_tpu.decode.tokenizer import SentencePieceModel

    path = str(tmp_path / "tok.model")
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    pieces += [(f"<0x{b:02X}>", 0.0, 6) for b in range(256)]
    base = len(pieces)
    pieces += [("▁привет", -0.5, 1), ("▁", -1.0, 1),
               ("п", -2.0, 1), ("р", -2.0, 1), ("и", -2.0, 1),
               ("в", -2.0, 1), ("е", -2.0, 1), ("т", -2.0, 1)]
    _write_tiny_sp_model(path, pieces)
    m = SentencePieceModel(path)

    # known text: whole-word piece wins
    assert m.encode("привет") == [base]
    # OOV 'x' (absent from vocab): encodes as its UTF-8 byte piece, not unk
    ids = m.encode("привет x")
    assert ids == [base, base + 1, 3 + ord("x")]
    # decode reconstructs the text incl. the byte-piece run
    assert m.decode(ids) == "привет x"
    # multi-byte OOV char: two byte pieces, round-trips
    ids2 = m.encode("привет ё")
    tail = "ё".encode("utf-8")
    assert ids2 == [base, base + 1] + [3 + b for b in tail]
    assert m.decode(ids2) == "привет ё"
    # invalid byte sequence decodes with U+FFFD replacement, like real SP
    assert m.decode([3 + 0xD0]) == "�"


def test_sp_decode_bos_and_byte_run_surface_rules(tmp_path):
    """decode() mirrors real sentencepiece's per-piece surface rules
    (sentencepiece_processor.cc ``DecodeSentencePiece``): byte-decoded
    content is literal — a byte run encoding U+2581 yields the character,
    not a space — and while the output is still empty each normal piece
    drops exactly ONE leading word-boundary (not a blanket lstrip)."""
    from test_export_serve import _write_tiny_sp_model

    from gigaam_tpu.decode.tokenizer import SentencePieceModel

    path = str(tmp_path / "tok.model")
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    pieces += [(f"<0x{b:02X}>", 0.0, 6) for b in range(256)]
    base = len(pieces)
    pieces += [("▁аб", -0.5, 1), ("▁▁аб", -0.9, 1), ("▁", -1.0, 1)]
    _write_tiny_sp_model(path, pieces)
    m = SentencePieceModel(path)

    # byte run for U+2581 (the word-boundary glyph itself): literal
    wb_bytes = [3 + b for b in "▁".encode("utf-8")]
    assert m.decode(wb_bytes) == "▁"
    # ... including at the start, and it ends the BOS window: the next
    # piece's leading ▁ becomes a real space
    assert m.decode(wb_bytes + [base]) == "▁ аб"

    # one leading ▁ consumed per piece while output is empty
    assert m.decode([base]) == "аб"
    assert m.decode([base + 2, base]) == "аб"       # "▁" -> "", still BOS
    assert m.decode([base + 1]) == " аб"            # double-▁: inner kept
    # control pieces keep the BOS window open
    assert m.decode([1, base]) == "аб"
    # after text exists, ▁ is a space everywhere
    assert m.decode([base, base]) == "аб аб"


def test_sp_no_byte_pieces_keeps_unk_fallback(tmp_path):
    """Without byte-fallback pieces, OOV chars still map to unk."""
    from test_export_serve import _write_tiny_sp_model

    from gigaam_tpu.decode.tokenizer import SentencePieceModel

    path = str(tmp_path / "tok.model")
    _write_tiny_sp_model(path, [("<unk>", 0.0, 2), ("▁аб", -0.5, 1)])
    m = SentencePieceModel(path)
    assert m.encode("аб x") == [1, 0, 0]   # '▁аб', unk('▁x' as 2 chars)


def test_parse_sp_model_truncated_mid_float(tmp_path):
    """A file cut inside a score float must surface as a diagnosable
    ValueError, not a bare struct.error."""
    from test_export_serve import _write_tiny_sp_model

    from gigaam_tpu.decode.tokenizer import parse_sp_model

    path = str(tmp_path / "tok.model")
    _write_tiny_sp_model(path, [("▁аб", -0.5, 1)])
    blob = open(path, "rb").read()
    # cut 2 bytes into the trailing float field; shrink BOTH length
    # prefixes (outer piece message + inner) so the parser reaches the
    # truncated float instead of failing the outer slice first
    cut = blob[:-5]
    bad = str(tmp_path / "bad.model")
    with open(bad, "wb") as f:
        f.write(bytes([cut[0], cut[1] - 5]) + cut[2:])
    with pytest.raises(ValueError, match="truncated or corrupt"):
        parse_sp_model(bad)


def test_frames_to_words_confidence_math():
    """Word confidence = exp(mean token logp) of exactly its tokens."""
    import math

    from gigaam_tpu.config import RU_VOCAB
    from gigaam_tpu.decode.timestamps import frames_to_words
    from gigaam_tpu.decode.tokenizer import Tokenizer

    tok = Tokenizer(list(RU_VOCAB))
    # "аб в": ids for а, б, space, в
    ids = [tok.encode("а")[0], tok.encode("б")[0], 0, tok.encode("в")[0]]
    frames = [2, 3, 5, 7]
    logps = [-0.2, -0.4, -9.0, -0.1]  # the space's logp must NOT leak in
    words = frames_to_words(tok, ids, frames, 0.04, token_logps=logps)
    assert [w.text for w in words] == ["аб", "в"]
    assert abs(words[0].confidence - math.exp(-0.3)) < 1e-9
    assert abs(words[1].confidence - math.exp(-0.1)) < 1e-9
    # without logps: None (old behavior preserved)
    w2 = frames_to_words(tok, ids, frames, 0.04)
    assert all(w.confidence is None for w in w2)


def test_rnnt_greedy_with_logps_is_consistent():
    """with_logps=True must not change decisions, and the logps must be
    finite, <= 0, and aligned with counts."""
    import jax

    from gigaam_tpu.config import (RNNTDecoderConfig, RNNTHeadConfig,
                                   RNNTJointConfig)
    from gigaam_tpu.models.heads import init_rnnt_head

    cfg = RNNTHeadConfig(
        decoder=RNNTDecoderConfig(pred_hidden=12, pred_rnn_layers=1,
                                  num_classes=6),
        joint=RNNTJointConfig(enc_hidden=16, pred_hidden=12,
                              joint_hidden=12, num_classes=6))
    params = init_rnnt_head(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    enc = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32) * 2)
    enc_len = jnp.asarray(np.array([6, 4], np.int32))

    t3 = rnnt_greedy_decode(params, enc, enc_len)
    t4 = rnnt_greedy_decode(params, enc, enc_len, with_logps=True)
    assert len(t3) == 3 and len(t4) == 4
    for a, b in zip(t3, t4[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    logps = np.asarray(t4[3])
    counts = np.asarray(t4[2])
    assert np.isfinite(logps).all()
    for b_ in range(2):
        got = logps[b_, :counts[b_]]
        assert (got <= 1e-6).all(), "log-probs must be <= 0"
        assert (got != 0).any() or counts[b_] == 0
