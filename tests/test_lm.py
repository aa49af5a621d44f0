"""n-gram LM + shallow-fusion tests (decode/lm.py — extension over the
reference, which decodes purely acoustically)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gigaam_tpu.decode.lm import NGramLM, train_lm_from_texts


def _toy_lm(order=3, v=5, seed=0):
    rng = np.random.default_rng(seed)
    seqs = [rng.integers(0, v, size=rng.integers(3, 12)).tolist()
            for _ in range(40)]
    return NGramLM.train(seqs, vocab_size=v, order=order), seqs


# -- LM math -----------------------------------------------------------------


@pytest.mark.parametrize("order", [1, 2, 3])
def test_lm_distributions_normalize(order):
    lm, seqs = _toy_lm(order=order)
    contexts = [[], [0], [1, 2], [4, 4, 4], seqs[0][:5], [3, 0, 2, 1]]
    for ctx in contexts:
        total = sum(np.exp(lm.logp(t, ctx)) for t in range(lm.vocab_size))
        assert abs(total - 1.0) < 1e-9, f"ctx {ctx}: sums to {total}"


def test_lm_learns_the_corpus():
    # corpus: token 1 always follows token 0
    lm = NGramLM.train([[0, 1] * 6 for _ in range(10)], vocab_size=4,
                       order=2)
    assert lm.logp(1, [0]) > lm.logp(2, [0]) + 2.0
    assert lm.logp(1, [0]) > lm.logp(1, [1])


def test_unseen_context_backs_off():
    lm, _ = _toy_lm(order=3)
    # context [4, 4, ..., unseen packing] must equal its backoff exactly
    # (WB with zero counts is pure backoff)
    unseen = [3, 3]  # may or may not be counted; find one that is not
    for a in range(5):
        for b in range(5):
            if lm.pack_context([a, b]) not in lm._counts[2]:
                unseen = [a, b]
                break
    p_full = lm.logp(2, unseen)
    p_back = lm.logp(2, unseen[-1:]) if lm.pack_context(
        unseen) in lm._counts[2] else None
    if p_back is None:  # genuinely uncounted context: equal to bigram prob
        assert abs(p_full - lm.logp(2, unseen[1:])) < 1e-12


def test_dense_table_matches_host_scorer():
    lm, seqs = _toy_lm(order=3)
    table = lm.dense_table()
    base = lm.vocab_size + 1
    assert table.shape == (base ** 2, lm.vocab_size)
    rng = np.random.default_rng(1)
    contexts = [[], [2], [0, 1], [4, 3], [1, 1, 1, 2]]  # incl. >order-1
    contexts += [rng.integers(0, 5, size=2).tolist() for _ in range(10)]
    for ctx in contexts:
        packed = lm.pack_context(ctx)
        for t in range(lm.vocab_size):
            np.testing.assert_allclose(
                table[packed, t], lm.logp(t, ctx), rtol=0, atol=1e-5)


def test_context_packing_shift():
    lm, _ = _toy_lm(order=4)
    ctx = lm.pack_context([])
    hist = []
    rng = np.random.default_rng(2)
    for t in rng.integers(0, 5, size=12):
        ctx = lm.shift_context(ctx, int(t))
        hist.append(int(t))
        assert ctx == lm.pack_context(hist)


def test_save_load_roundtrip(tmp_path):
    lm, _ = _toy_lm(order=3)
    path = str(tmp_path / "lm.npz")
    lm.save(path)
    lm2 = NGramLM.load(path)
    assert lm2.order == lm.order and lm2.vocab_size == lm.vocab_size
    rng = np.random.default_rng(3)
    for _ in range(20):
        ctx = rng.integers(0, 5, size=rng.integers(0, 4)).tolist()
        t = int(rng.integers(0, 5))
        assert lm.logp(t, ctx) == lm2.logp(t, ctx)


def test_save_load_without_npz_suffix(tmp_path):
    """np.savez appends '.npz' when missing; save/load must still
    round-trip on a bare path (asymmetry fixed per round-3 advice)."""
    lm, _ = _toy_lm(order=2)
    path = str(tmp_path / "lm")  # no .npz
    lm.save(path)
    lm2 = NGramLM.load(path)
    assert lm2.logp(1, [0]) == lm.logp(1, [0])


def test_rnnt_beam_rejects_table_without_base():
    """Passing lm_table without (lm_base, lm_ctx_len) must raise, not
    silently decode without fusion."""
    import jax.numpy as jnp
    import pytest

    from gigaam_tpu.decode.rnnt_beam import rnnt_beam_decode

    params, d = _tiny_head()
    enc = jnp.zeros((1, 3, d))
    with pytest.raises(ValueError, match="lm_base"):
        rnnt_beam_decode(params, enc, jnp.array([3]),
                         lm_table=jnp.zeros((4, 3)))


def test_score_sequence_is_sum_of_logps():
    lm, seqs = _toy_lm()
    seq = seqs[0]
    manual = sum(lm.logp(t, seq[:i]) for i, t in enumerate(seq))
    assert abs(lm.score_sequence(seq) - manual) < 1e-9


def test_dense_table_size_guard():
    lm = NGramLM(vocab_size=512, order=3)
    lm.add_sequence([1, 2, 3])
    with pytest.raises(ValueError, match="dense table"):
        lm.dense_table()


def test_train_from_texts_charwise():
    from gigaam_tpu.config import RU_VOCAB
    from gigaam_tpu.decode.tokenizer import Tokenizer

    tok = Tokenizer(list(RU_VOCAB))
    lm = train_lm_from_texts(["привет мир", "привет всем"], tok, order=3)
    assert lm.vocab_size == len(tok)
    # 'р' after 'п' (привет) must beat an unseen continuation
    p, r, x = tok.encode("п")[0], tok.encode("р")[0], tok.encode("ю")[0]
    assert lm.logp(r, [p]) > lm.logp(x, [p])


# -- CTC prefix-beam fusion --------------------------------------------------


def _tied_posteriors(v=4, t_max=4):
    """Acoustics mildly preferring token 0 over token 1 at frame 1."""
    blank = v - 1
    lp = np.full((t_max, v), -8.0)
    lp[0, blank] = -0.01
    lp[1, 0] = -0.60
    lp[1, 1] = -0.65
    lp[2, blank] = -0.01
    lp[3, blank] = -0.01
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


def test_ctc_fusion_zero_weight_is_identity():
    from gigaam_tpu.decode.ctc_beam import ctc_prefix_beam

    lm, _ = _toy_lm(v=4)
    rng = np.random.default_rng(4)
    lp = rng.standard_normal((8, 5)) * 2.0
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    base = ctc_prefix_beam(lp, beam_size=8)
    lm4 = NGramLM.train([[0, 1, 2, 3]], vocab_size=4, order=2)
    fused = ctc_prefix_beam(lp, beam_size=8, lm=lm4, lm_weight=0.0)
    assert base == fused


def test_ctc_fusion_flips_near_tie():
    from gigaam_tpu.decode.ctc_beam import ctc_prefix_beam

    lp = _tied_posteriors()
    # without LM: acoustics pick token 0
    toks, _ = ctc_prefix_beam(lp, beam_size=8)
    assert toks == [0]
    # LM trained only on token-1 sequences flips the near-tie
    lm = NGramLM.train([[1, 1, 1]] * 20, vocab_size=3, order=2)
    toks_lm, frames = ctc_prefix_beam(lp, beam_size=8, lm=lm,
                                      lm_weight=0.5)
    assert toks_lm == [1]
    assert frames == [1]


def test_ctc_fusion_token_bonus_lengthens():
    """A large insertion bonus must never shorten the output."""
    from gigaam_tpu.decode.ctc_beam import ctc_prefix_beam

    rng = np.random.default_rng(5)
    lp = rng.standard_normal((10, 5)) * 1.5
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    lm, _ = _toy_lm(v=4)
    short, _ = ctc_prefix_beam(lp, beam_size=8, lm=lm, lm_weight=0.2,
                               token_bonus=-2.0)
    long_, _ = ctc_prefix_beam(lp, beam_size=8, lm=lm, lm_weight=0.2,
                               token_bonus=2.0)
    assert len(long_) >= len(short)


# -- RNNT on-device fusion ---------------------------------------------------


def _tiny_head(seed=0, v=5, hdim=12, d=16):
    from gigaam_tpu.config import (RNNTDecoderConfig, RNNTHeadConfig,
                                   RNNTJointConfig)
    from gigaam_tpu.models.heads import init_rnnt_head

    cfg = RNNTHeadConfig(
        decoder=RNNTDecoderConfig(pred_hidden=hdim, pred_rnn_layers=1,
                                  num_classes=v),
        joint=RNNTJointConfig(enc_hidden=d, pred_hidden=hdim,
                              joint_hidden=hdim, num_classes=v))
    return init_rnnt_head(jax.random.PRNGKey(seed), cfg), d


def _host_fused_greedy(params, encoded_b, enc_len_b, lm, lm_weight,
                       token_bonus, max_symbols=10):
    """Host replica of rnnt_beam_decode(beam_size=1, lm_table=...): per
    expansion, best fused label score vs stay (blank) score, with the
    beam's blank-on-tie preference."""
    from gigaam_tpu.models.heads import rnnt_joint_step, rnnt_predict_step

    blank = params["decoder"]["embed"].shape[0] - 1
    n_layers = len(params["decoder"]["lstm"])
    hidden = params["decoder"]["embed"].shape[1]
    h = np.zeros((n_layers, 1, hidden), np.float32)
    c = np.zeros((n_layers, 1, hidden), np.float32)
    label, ctx = blank, lm.pack_context([])
    out = []
    for t in range(int(enc_len_b)):
        for _ in range(max_symbols):
            pred, h_new, c_new = rnnt_predict_step(
                params, jnp.asarray([label]),
                jnp.asarray(h), jnp.asarray(c))
            logp = np.asarray(rnnt_joint_step(
                params, jnp.asarray(encoded_b[None, t]), pred))[0]
            fused = logp[:blank].astype(np.float64).copy()
            for tok in range(blank):
                fused[tok] += lm_weight * lm.logp_packed(tok, ctx) \
                    + token_bonus
            best = int(np.argmax(fused))
            if fused[best] > logp[blank]:  # strict: ties prefer blank
                out.append((best, t))
                label = best
                ctx = lm.shift_context(ctx, best)
                h, c = np.asarray(h_new), np.asarray(c_new)
            else:
                break
    return out


def test_rnnt_fusion_beam1_matches_host_replay():
    from gigaam_tpu.decode.rnnt_beam import rnnt_beam_decode
    from gigaam_tpu.decode.rnnt_greedy import rnnt_extract

    params, d = _tiny_head(seed=2)
    lm, _ = _toy_lm(v=4)  # head v=5 -> 4 labels + blank
    table = jnp.asarray(lm.dense_table())
    rng = np.random.default_rng(7)
    encoded = rng.standard_normal((3, 7, d)).astype(np.float32) * 2.0
    enc_len = np.array([7, 5, 2], np.int32)

    toks, frames, counts = rnnt_beam_decode(
        params, jnp.asarray(encoded), jnp.asarray(enc_len), beam_size=1,
        lm_table=table, lm_base=lm.vocab_size + 1,
        lm_ctx_len=lm.order - 1, lm_weight=0.7, token_bonus=0.1)
    dev = rnnt_extract(np.asarray(toks), np.asarray(frames),
                       np.asarray(counts))
    for b in range(3):
        host = _host_fused_greedy(params, encoded[b], enc_len[b], lm,
                                  lm_weight=0.7, token_bonus=0.1)
        assert dev[b] == ([tk for tk, _ in host], [f for _, f in host]), (
            f"sample {b}: device {dev[b]} vs host {host}")


def test_rnnt_fusion_zero_weight_matches_plain_beam():
    from gigaam_tpu.decode.rnnt_beam import rnnt_beam_decode

    params, d = _tiny_head(seed=4)
    lm, _ = _toy_lm(v=4)
    table = jnp.asarray(lm.dense_table())
    rng = np.random.default_rng(8)
    encoded = rng.standard_normal((2, 6, d)).astype(np.float32) * 2.0
    enc_len = np.array([6, 4], np.int32)

    plain = rnnt_beam_decode(params, jnp.asarray(encoded),
                             jnp.asarray(enc_len), beam_size=4)
    fused = rnnt_beam_decode(params, jnp.asarray(encoded),
                             jnp.asarray(enc_len), beam_size=4,
                             lm_table=table, lm_base=lm.vocab_size + 1,
                             lm_ctx_len=lm.order - 1, lm_weight=0.0,
                             token_bonus=0.0)
    for a, b in zip(plain, fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -- sparse device table -----------------------------------------------------


def _sparse_lookup_np(spec, base, packed):
    """Numpy replica of the device longest-counted-suffix lookup."""
    row = np.array(spec["row0"], np.float32)
    mod = 1
    for ids, rows in spec["levels"]:
        mod *= base
        if len(ids) == 0:
            continue
        suf = packed % mod
        i = np.searchsorted(ids, suf)
        if i < len(ids) and ids[i] == suf:
            row = rows[i]
    return row


@pytest.mark.parametrize("order", [2, 3, 4])
def test_sparse_table_matches_host_scorer(order):
    lm, _ = _toy_lm(order=order)
    spec = lm.sparse_table()
    base = lm.vocab_size + 1
    rng = np.random.default_rng(0)
    for _ in range(30):
        ctx = rng.integers(0, lm.vocab_size,
                           size=rng.integers(0, order + 1)).tolist()
        packed = lm.pack_context(ctx)
        row = _sparse_lookup_np(spec, base, packed)
        for tok in range(lm.vocab_size):
            np.testing.assert_allclose(
                row[tok], lm.logp_packed(tok, packed), rtol=1e-5,
                err_msg=f"ctx={ctx} tok={tok}")


def test_sparse_table_matches_dense_table():
    """Where the dense table exists, the sparse lookup must agree row for
    row (they encode the same WB interpolation)."""
    lm, _ = _toy_lm(order=3)
    dense = lm.dense_table()
    spec = lm.sparse_table()
    base = lm.vocab_size + 1
    for packed in range(dense.shape[0]):
        np.testing.assert_allclose(
            _sparse_lookup_np(spec, base, packed), dense[packed],
            rtol=1e-6)


def test_rnnt_beam_sparse_equals_dense():
    """On-device beam with the sparse table == with the dense table."""
    from gigaam_tpu.decode.rnnt_beam import rnnt_beam_decode

    params, d = _tiny_head(seed=2)
    lm, _ = _toy_lm(v=4, order=3)
    rng = np.random.default_rng(9)
    encoded = rng.standard_normal((3, 7, d)).astype(np.float32) * 2.0
    enc_len = np.array([7, 5, 2], np.int32)
    kw = dict(beam_size=4, lm_base=lm.vocab_size + 1,
              lm_ctx_len=lm.order - 1, lm_weight=0.7, token_bonus=0.1)

    dense = rnnt_beam_decode(params, jnp.asarray(encoded),
                             jnp.asarray(enc_len),
                             lm_table=jnp.asarray(lm.dense_table()), **kw)
    sparse = rnnt_beam_decode(
        params, jnp.asarray(encoded), jnp.asarray(enc_len),
        lm_table=jax.tree.map(jnp.asarray, lm.sparse_table()), **kw)
    for a, b in zip(dense, sparse):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sp_vocab_trigram_fusion_on_device():
    """The round-3 gap: a 512-token (SP-sized) vocab trigram LM must fuse
    on device — the dense table would be 513^2 x 512 = 539 MB and is
    guarded off; the sparse table runs and matches the host scorer."""
    from gigaam_tpu.decode.rnnt_beam import rnnt_beam_decode
    from gigaam_tpu.decode.rnnt_greedy import rnnt_extract

    v_lab = 512                       # labels; head classes = 513
    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, v_lab, 12).tolist() for _ in range(20)]
    lm = NGramLM.train(seqs, vocab_size=v_lab, order=3)
    with pytest.raises(ValueError):
        lm.dense_table()              # the guard this test exists to lift

    spec = lm.sparse_table()
    assert sum(len(ids) for ids, _ in spec["levels"]) > 0

    params, d = _tiny_head(seed=5, v=v_lab + 1)
    encoded = rng.standard_normal((2, 5, d)).astype(np.float32) * 2.0
    enc_len = np.array([5, 3], np.int32)
    toks, frames, counts = rnnt_beam_decode(
        params, jnp.asarray(encoded), jnp.asarray(enc_len), beam_size=1,
        lm_table=jax.tree.map(jnp.asarray, spec),
        lm_base=lm.vocab_size + 1, lm_ctx_len=lm.order - 1,
        lm_weight=0.7, token_bonus=0.05)
    dev = rnnt_extract(np.asarray(toks), np.asarray(frames),
                       np.asarray(counts))
    for b in range(2):
        host = _host_fused_greedy(params, encoded[b], enc_len[b], lm,
                                  lm_weight=0.7, token_bonus=0.05)
        assert dev[b] == ([tk for tk, _ in host], [f for _, f in host]), (
            f"sample {b}: device {dev[b]} vs host {host}")


# -- model API wiring --------------------------------------------------------


def test_transcribe_lm_api(tmp_path):
    from gigaam_tpu.audio import save_wav
    from gigaam_tpu.models.model import GigaAMASR
    from test_training import tiny_cfg

    for kind in ("ctc", "rnnt"):
        model = GigaAMASR(tiny_cfg(kind), seed=0,
                          compute_dtype=jnp.float32)
        lm = NGramLM.train(
            [[0, 1, 2]] * 5, vocab_size=len(model.tokenizer), order=2)
        lm_path = str(tmp_path / f"lm_{kind}.npz")
        lm.save(lm_path)
        p = str(tmp_path / f"{kind}.wav")
        save_wav(p, (0.1 * np.random.default_rng(0)
                     .standard_normal(16000)).astype(np.float32))
        res = model.transcribe(p, beam_size=4, lm=lm_path, lm_weight=0.3)
        assert isinstance(res.text, str)
        # object and path routes agree
        res2 = model.transcribe(p, beam_size=4, lm=lm, lm_weight=0.3)
        assert res2.text == res.text
        with pytest.raises(ValueError, match="beam_size"):
            model.transcribe(p, lm=lm)
        bad = NGramLM.train([[0]], vocab_size=3, order=2)
        with pytest.raises(ValueError, match="vocab"):
            model.transcribe(p, beam_size=4, lm=bad)
