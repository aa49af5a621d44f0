"""CTC forced alignment: Viterbi DP unit tests + the align() model API.

Extension surface (the reference has no alignment); the DP is pinned
against planted paths with known frame positions.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gigaam_tpu.decode.align import (
    NEG,
    backtrack,
    pad_targets,
    viterbi_align,
)


def _planted_log_probs(t, v, path_labels):
    """log_probs strongly peaked on ``path_labels`` (one label per frame)."""
    lp = np.full((t, v), -20.0, np.float32)
    for i, lab in enumerate(path_labels):
        lp[i, lab] = -0.01
    # renormalize-ish: tests only need relative order, logs stay logs
    return jnp.asarray(lp)


def _run(lp, enc_len, ids, blank):
    targets = pad_targets(ids)
    bp, fs, score = viterbi_align(lp, np.int32(enc_len),
                                  jnp.asarray(targets), np.int32(len(ids)),
                                  np.int32(blank))
    return np.asarray(bp), int(fs), float(score), targets


def test_align_recovers_planted_path():
    blank = 4
    # frames:  b  1  1  b  2  3  3  b   (tokens 1,2,3; 1 repeated frames)
    path = [blank, 1, 1, blank, 2, 3, 3, blank]
    lp = _planted_log_probs(len(path), 5, path)
    bp, fs, score, targets = _run(lp, len(path), [1, 2, 3], blank)
    assert score > -1.0                      # found the cheap planted path
    frames, logps = backtrack(bp, fs, len(path), 3,
                              np.asarray(lp), targets)
    assert frames == [1, 4, 5]               # first frame of each token
    # confidence: mean posterior over occupied frames, all ~ -0.01
    assert all(abs(l + 0.01) < 1e-5 for l in logps)


def test_align_repeated_tokens_need_blank():
    """CTC topology: identical adjacent targets MUST pass through blank —
    4 frames cannot fit 'aa' in 3 states + mandatory separator... while
    distinct targets can skip the separator blank entirely."""
    blank = 4
    # 2 frames emitting '1 1' with no blank between: infeasible for [1, 1]
    lp = _planted_log_probs(2, 5, [1, 1])
    _, _, score, _ = _run(lp, 2, [1, 1], blank)
    assert score <= NEG / 2
    # but the same 2 frames fit [1] (two frames of the same state) ...
    _, _, s1, _ = _run(lp, 2, [1], blank)
    assert s1 > -1.0
    # ... and distinct [1, 2] fits 2 frames via the skip transition
    lp2 = _planted_log_probs(2, 5, [1, 2])
    _, _, s2, _ = _run(lp2, 2, [1, 2], blank)
    assert s2 > -1.0


def test_align_infeasible_when_too_many_tokens():
    blank = 4
    lp = _planted_log_probs(3, 5, [1, 2, 3])
    _, _, score, _ = _run(lp, 3, [1, 2, 3, 1, 2], blank)
    assert score <= NEG / 2


def test_align_respects_enc_len():
    """Frames past enc_len must not help the path."""
    blank = 4
    path = [1, 2, blank, blank, 3, 3]        # token 3 only after enc_len
    lp = _planted_log_probs(len(path), 5, path)
    _, _, score, _ = _run(lp, 4, [1, 2, 3], blank)   # enc_len=4 cuts '3'
    assert score < -15.0                      # must pay a -20 somewhere
    _, _, s_full, _ = _run(lp, 6, [1, 2, 3], blank)
    assert s_full > -1.0


def test_pad_targets_bucket():
    assert pad_targets([1, 2, 3], bucket=8).shape == (8,)
    assert pad_targets(list(range(9)), bucket=8).shape == (16,)
    assert pad_targets([], bucket=8).shape == (8,)
    np.testing.assert_array_equal(pad_targets([5], bucket=4)[:1], [5])


def test_model_align_api(tmp_path):
    """align() on a tiny random-weight CTC model: aligning the model's own
    greedy transcript must succeed with monotonic, in-range word spans and
    confidences in (0, 1]."""
    from test_model_api import tiny_ctc_cfg, tiny_rnnt_cfg

    from gigaam_tpu.audio import save_wav
    from gigaam_tpu.models.model import GigaAMASR

    rng = np.random.default_rng(3)
    wav = (0.2 * rng.standard_normal(16000 * 2)).astype(np.float32)
    path = str(tmp_path / "noise.wav")
    save_wav(path, wav)

    model = GigaAMASR(tiny_ctc_cfg(), seed=0, compute_dtype=jnp.float32)
    hyp = model.transcribe(path).text
    if not hyp.strip():
        pytest.skip("random weights produced an empty transcript")
    res = model.align(path, hyp)
    assert res.words, "non-empty transcript must align to words"
    dur = len(wav) / 16000.0
    prev_end = 0.0
    for w in res.words:
        assert 0.0 <= w.start < w.end <= dur + 1e-6
        assert w.start >= prev_end - 1e-6    # monotonic, non-overlapping
        prev_end = w.start                    # starts ordered
        assert w.confidence is not None and 0.0 < w.confidence <= 1.0
    # align text = decode(encode(normalize(text))): the alignable
    # normalization (reference text rules: ё->е, lowercase, vocab filter)
    from gigaam_tpu.data import normalize_text

    norm = normalize_text(hyp, model.cfg.decoding.vocabulary, raw_text=True)
    assert res.text == model.tokenizer.decode(model.tokenizer.encode(norm))
    # 'ё' in the input aligns as 'е' instead of being dropped
    res2 = model.align(path, hyp + " ёж")
    assert res2.text.endswith("еж")

    # RNNT models have no frame-level lattice
    rnnt = GigaAMASR(tiny_rnnt_cfg(), seed=0, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="CTC"):
        rnnt.align(path, "привет")


def test_model_align_batch_matches_single(tmp_path):
    """align_batch == per-file align, and handles empty transcripts and
    arg-length mismatches."""
    from test_model_api import tiny_ctc_cfg

    from gigaam_tpu.audio import save_wav
    from gigaam_tpu.models.model import GigaAMASR

    rng = np.random.default_rng(7)
    paths = []
    for i, sec in enumerate((1.0, 2.0)):
        wav = (0.2 * rng.standard_normal(int(16000 * sec))).astype(
            np.float32)
        p = str(tmp_path / f"n{i}.wav")
        save_wav(p, wav)
        paths.append(p)
    model = GigaAMASR(tiny_ctc_cfg(), seed=0, compute_dtype=jnp.float32)
    texts = [model.transcribe(p).text for p in paths]
    if not all(t.strip() for t in texts):
        pytest.skip("random weights produced an empty transcript")
    singles = [model.align(p, t) for p, t in zip(paths, texts)]
    batched = model.align_batch(paths, texts)
    for s, b in zip(singles, batched):
        assert s.text == b.text
        assert [(w.text, w.start, w.end) for w in s.words] == \
               [(w.text, w.start, w.end) for w in b.words]

    # empty transcript rides along as an empty result
    mixed = model.align_batch(paths, [texts[0], ""])
    assert mixed[1].text == "" and mixed[1].words == []
    with pytest.raises(ValueError, match="wavs vs"):
        model.align_batch(paths, [texts[0]])
    assert model.align_batch([], []) == []


def test_model_align_infeasible_transcript(tmp_path):
    """A transcript with more CTC states than encoder frames raises."""
    from test_model_api import tiny_ctc_cfg

    from gigaam_tpu.audio import save_wav
    from gigaam_tpu.models.model import GigaAMASR

    rng = np.random.default_rng(4)
    wav = (0.2 * rng.standard_normal(4000)).astype(np.float32)  # 0.25 s
    path = str(tmp_path / "short.wav")
    save_wav(path, wav)
    model = GigaAMASR(tiny_ctc_cfg(), seed=0, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="does not fit"):
        model.align(path, "а" * 300)   # repeated char: needs 2 frames each
