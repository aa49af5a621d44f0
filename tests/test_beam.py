"""RNNT beam-search tests: K=1 must be decision-identical to the greedy
decoder, and K>1 must never score worse than greedy under the model's own
cumulative log-probability."""

import numpy as np

import jax
import jax.numpy as jnp

from gigaam_tpu.config import RNNTDecoderConfig, RNNTHeadConfig, RNNTJointConfig
from gigaam_tpu.decode.rnnt_beam import rnnt_beam_decode
from gigaam_tpu.decode.rnnt_greedy import rnnt_extract, rnnt_greedy_decode
from gigaam_tpu.models.heads import (
    init_rnnt_head,
    rnnt_joint_step,
    rnnt_predict_step,
)


def _tiny_head(seed=0, v=8, hdim=12, d=16):
    cfg = RNNTHeadConfig(
        decoder=RNNTDecoderConfig(pred_hidden=hdim, pred_rnn_layers=1,
                                  num_classes=v),
        joint=RNNTJointConfig(enc_hidden=d, pred_hidden=hdim,
                              joint_hidden=hdim, num_classes=v))
    return init_rnnt_head(jax.random.PRNGKey(seed), cfg), d


def _replay_score(params, encoded_b, enc_len_b, ids, frames,
                  max_symbols=10):
    """Cumulative log-prob of the alignment (ids, frames) induces: emitted
    labels at their frames, blank at every frame that ended with fewer than
    max_symbols emissions (the cap abandons the frame without paying
    blank, mirroring gigaam/decoding.py:189)."""
    blank = params["decoder"]["embed"].shape[0] - 1
    n_layers = len(params["decoder"]["lstm"])
    hidden = params["decoder"]["embed"].shape[1]
    h = jnp.zeros((n_layers, 1, hidden), jnp.float32)
    c = jnp.zeros((n_layers, 1, hidden), jnp.float32)
    label = blank
    score, ptr = 0.0, 0
    for t in range(int(enc_len_b)):
        n_emit = 0
        while ptr < len(ids) and frames[ptr] == t:
            pred, h_new, c_new = rnnt_predict_step(
                params, jnp.asarray([label]), h, c)
            logp = rnnt_joint_step(
                params, jnp.asarray(encoded_b[None, t]), pred)
            score += float(logp[0, ids[ptr]])
            label = ids[ptr]
            h, c = h_new, c_new
            ptr += 1
            n_emit += 1
        if n_emit < max_symbols:
            pred, _, _ = rnnt_predict_step(params, jnp.asarray([label]), h, c)
            logp = rnnt_joint_step(
                params, jnp.asarray(encoded_b[None, t]), pred)
            score += float(logp[0, blank])
    assert ptr == len(ids), "alignment does not consume all tokens"
    return score


def test_beam1_equals_greedy():
    params, d = _tiny_head()
    rng = np.random.default_rng(0)
    encoded = rng.standard_normal((3, 11, d)).astype(np.float32) * 2.0
    enc_len = np.array([11, 7, 3], np.int32)

    g = rnnt_extract(*map(np.asarray, rnnt_greedy_decode(
        params, jnp.asarray(encoded), jnp.asarray(enc_len))))
    b1 = rnnt_extract(*map(np.asarray, rnnt_beam_decode(
        params, jnp.asarray(encoded), jnp.asarray(enc_len), beam_size=1)))
    for bi in range(3):
        assert b1[bi] == g[bi], f"sample {bi}: beam=1 != greedy"


def test_beam_scores_at_least_greedy():
    params, d = _tiny_head(seed=3)
    rng = np.random.default_rng(5)
    encoded = rng.standard_normal((4, 9, d)).astype(np.float32) * 2.0
    enc_len = np.array([9, 9, 6, 4], np.int32)

    g = rnnt_extract(*map(np.asarray, rnnt_greedy_decode(
        params, jnp.asarray(encoded), jnp.asarray(enc_len))))
    b4 = rnnt_extract(*map(np.asarray, rnnt_beam_decode(
        params, jnp.asarray(encoded), jnp.asarray(enc_len), beam_size=4)))

    improved = 0
    for bi in range(4):
        sg = _replay_score(params, encoded[bi], enc_len[bi], *g[bi])
        sb = _replay_score(params, encoded[bi], enc_len[bi], *b4[bi])
        assert sb >= sg - 1e-4, (
            f"sample {bi}: beam score {sb} < greedy {sg}")
        improved += sb > sg + 1e-6
    # with an untrained model at least one sample should genuinely improve
    assert improved >= 1


def test_beam_respects_length_and_is_deterministic():
    params, d = _tiny_head(seed=1)
    rng = np.random.default_rng(2)
    encoded = rng.standard_normal((2, 8, d)).astype(np.float32) * 2.0
    enc_len = np.array([8, 5], np.int32)

    r1 = rnnt_beam_decode(params, jnp.asarray(encoded),
                          jnp.asarray(enc_len), beam_size=4)
    r2 = rnnt_beam_decode(params, jnp.asarray(encoded),
                          jnp.asarray(enc_len), beam_size=4)
    for a, b_ in zip(r1, r2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    out = rnnt_extract(*map(np.asarray, r1))
    for bi, (ids, frames) in enumerate(out):
        assert all(0 <= f < enc_len[bi] for f in frames)
        assert frames == sorted(frames)


def test_transcribe_beam_api(tmp_path):
    """beam_size plumbs through the public transcribe API."""
    import jax.numpy as jnp

    from gigaam_tpu.audio import save_wav
    from gigaam_tpu.models.model import GigaAMASR
    from test_training import tiny_cfg

    model = GigaAMASR(tiny_cfg("rnnt"), seed=0, compute_dtype=jnp.float32)
    p = str(tmp_path / "t.wav")
    save_wav(p, (0.1 * np.random.default_rng(0)
                 .standard_normal(16000)).astype(np.float32))
    res_g = model.transcribe(p)
    res_b = model.transcribe(p, beam_size=4, word_timestamps=True)
    assert isinstance(res_b.text, str)
    assert res_b.words is not None
    # beam=1 through the API must match plain greedy
    assert model.transcribe(p, beam_size=1).text == res_g.text


# -- CTC prefix beam search (decode/ctc_beam.py) -----------------------------


def _ctc_string_logprob(log_probs, y, blank):
    """Exact log P(y | x) by the CTC forward algorithm (oracle)."""
    t_max, _ = log_probs.shape
    # expanded label sequence with blanks: b y1 b y2 b ... b
    z = [blank]
    for c in y:
        z += [c, blank]
    alpha = np.full(len(z), -np.inf)
    alpha[0] = log_probs[0, z[0]]
    if len(z) > 1:
        alpha[1] = log_probs[0, z[1]]
    for t in range(1, t_max):
        prev = alpha.copy()
        for s in range(len(z)):
            best = prev[s]
            if s >= 1:
                best = np.logaddexp(best, prev[s - 1])
            if s >= 2 and z[s] != blank and z[s] != z[s - 2]:
                best = np.logaddexp(best, prev[s - 2])
            alpha[s] = best + log_probs[t, z[s]]
    out = alpha[-1]
    if len(z) > 1:
        out = np.logaddexp(out, alpha[-2])
    return out


def test_ctc_prefix_beam_matches_exact_argmax():
    """With a wide beam on a tiny problem, prefix beam search must find the
    exact maximum-posterior label string (oracle: CTC forward algorithm
    over every string up to length T)."""
    from itertools import product

    from gigaam_tpu.decode.ctc_beam import ctc_prefix_beam

    rng = np.random.default_rng(0)
    t_max, v = 5, 4  # 3 symbols + blank
    blank = v - 1
    for trial in range(10):
        logits = rng.standard_normal((t_max, v)) * 2.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

        cands = [()]
        for ln in range(1, t_max + 1):
            cands += list(product(range(v - 1), repeat=ln))
        scores = {y: _ctc_string_logprob(lp, y, blank) for y in cands}
        best_exact = max(scores, key=scores.get)

        tokens, frames = ctc_prefix_beam(lp, beam_size=64, prune_vocab=v)
        assert tuple(tokens) == best_exact, (
            f"trial {trial}: beam {tokens} vs exact {list(best_exact)}")
        assert len(frames) == len(tokens)
        assert frames == sorted(frames)


def test_ctc_prefix_beam_respects_length():
    from gigaam_tpu.decode.ctc_beam import ctc_prefix_beam

    rng = np.random.default_rng(1)
    lp = rng.standard_normal((10, 5))
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    full, _ = ctc_prefix_beam(lp, beam_size=8)
    trunc, _ = ctc_prefix_beam(lp, length=4, beam_size=8)
    also, _ = ctc_prefix_beam(lp[:4], beam_size=8)
    assert trunc == also


def test_ctc_prefix_beam_merge_cap_binds_harmlessly():
    """At realistic shapes (V=40, beam 8, prune_vocab 16) the default
    merge_cap=4 DOES bind (128 candidate cells vs cap 32).  On peaky,
    trained-model-like posteriors the pruned decode must equal the
    unpruned one — the cap drops only low-scoring summands."""
    from gigaam_tpu.decode.ctc_beam import ctc_prefix_beam

    rng = np.random.default_rng(7)
    t_max, v = 60, 40
    for trial in range(8):
        # peaky: one dominant symbol per frame plus noise, like a trained
        # CTC head (blank-dominant most frames)
        logits = rng.standard_normal((t_max, v))
        hot = rng.integers(0, v, t_max)
        hot[rng.random(t_max) < 0.6] = v - 1  # blank-dominant
        logits[np.arange(t_max), hot] += 6.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

        capped, cf = ctc_prefix_beam(lp, beam_size=8, prune_vocab=16,
                                     merge_cap=4)
        full, ff = ctc_prefix_beam(lp, beam_size=8, prune_vocab=16,
                                   merge_cap=10**9)
        assert capped == full, f"trial {trial}: {capped} vs {full}"
        assert cf == ff


def test_ctc_prefix_beam_lm_ignores_merge_cap():
    """Under shallow fusion the acoustic-only merge cap must not bind:
    merge_cap=1 (absurdly tight) and merge_cap=inf must decode the same
    because fusion disables the cap."""
    from gigaam_tpu.decode.ctc_beam import ctc_prefix_beam
    from gigaam_tpu.decode.lm import NGramLM

    rng = np.random.default_rng(11)
    t_max, v = 20, 12
    lm = NGramLM.train([[1, 2, 3], [1, 2, 4], [1, 2, 3]],
                       vocab_size=v - 1, order=3)
    logits = rng.standard_normal((t_max, v)) * 2.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    tight, _ = ctc_prefix_beam(lp, beam_size=8, lm=lm, lm_weight=0.5,
                               merge_cap=1)
    loose, _ = ctc_prefix_beam(lp, beam_size=8, lm=lm, lm_weight=0.5,
                               merge_cap=10**9)
    assert tight == loose


def test_ctc_transcribe_beam_api(tmp_path):
    """beam_size>1 on a CTC model runs prefix beam; beam=1 stays greedy."""
    from gigaam_tpu.audio import save_wav
    from gigaam_tpu.models.model import GigaAMASR
    from test_training import tiny_cfg

    model = GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)
    p = str(tmp_path / "t.wav")
    save_wav(p, (0.1 * np.random.default_rng(2)
                 .standard_normal(16000)).astype(np.float32))
    res_g = model.transcribe(p)
    res_b = model.transcribe(p, beam_size=8)
    assert isinstance(res_b.text, str)
    assert model.transcribe(p, beam_size=1).text == res_g.text


def test_rnnt_beam_with_logps_matches_greedy_at_k1():
    """with_logps must not change beam decisions, and at K=1 the acoustic
    logp track must equal the greedy decoder's (same decision sequence,
    same joint distributions)."""
    from gigaam_tpu.decode.rnnt_greedy import rnnt_greedy_decode

    params, d = _tiny_head(seed=6)
    rng = np.random.default_rng(12)
    encoded = jnp.asarray(
        rng.standard_normal((2, 6, d)).astype(np.float32) * 2.0)
    enc_len = jnp.asarray(np.array([6, 4], np.int32))

    b3 = rnnt_beam_decode(params, encoded, enc_len, beam_size=1)
    b4 = rnnt_beam_decode(params, encoded, enc_len, beam_size=1,
                          with_logps=True)
    assert len(b4) == 4
    for a, b in zip(b3, b4[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    g4 = rnnt_greedy_decode(params, encoded, enc_len, with_logps=True)
    counts = np.asarray(g4[2])
    np.testing.assert_array_equal(np.asarray(b4[0]), np.asarray(g4[0]))
    for bi in range(2):
        n = counts[bi]
        np.testing.assert_allclose(np.asarray(b4[3])[bi, :n],
                                   np.asarray(g4[3])[bi, :n], atol=1e-5)


def test_rnnt_beam_logps_are_acoustic_not_fused():
    """Under LM fusion the logp track must stay the PRE-fusion acoustic
    joint log-prob (confidence measures the model, not the LM bias)."""
    from gigaam_tpu.decode.lm import NGramLM

    params, d = _tiny_head(seed=7, v=5)
    lm = NGramLM.train([[0, 1, 2]] * 10, vocab_size=4, order=2)
    rng = np.random.default_rng(13)
    encoded = jnp.asarray(
        rng.standard_normal((1, 5, d)).astype(np.float32) * 2.0)
    enc_len = jnp.asarray(np.array([5], np.int32))

    toks, frames, counts, logps = rnnt_beam_decode(
        params, encoded, enc_len, beam_size=2,
        lm_table=jnp.asarray(lm.dense_table()), lm_base=lm.vocab_size + 1,
        lm_ctx_len=lm.order - 1, lm_weight=0.9, token_bonus=0.3,
        with_logps=True)
    n = int(np.asarray(counts)[0])
    got = np.asarray(logps)[0, :n]
    assert (got <= 1e-5).all(), (
        "fused scores can exceed 0 via token_bonus; acoustic log-probs "
        "cannot — the track leaked the fused value")
