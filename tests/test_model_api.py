"""End-to-end model API tests on random weights + synthetic audio:
transcribe (CTC & RNNT), embed_audio, get_probs, longform, save/load
round-trip.  Mirrors the reference test surface (``tests/test_loading.py``,
``tests/test_longform.py``) without needing checkpoint downloads."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import gigaam_tpu
from gigaam_tpu.audio import save_wav
from gigaam_tpu.config import (
    CTCHeadConfig,
    DecodingConfig,
    EncoderConfig,
    FeaturesConfig,
    ModelConfig,
    RNNTDecoderConfig,
    RNNTHeadConfig,
    RNNTJointConfig,
    RU_VOCAB,
    EmoHeadConfig,
)
from gigaam_tpu.models.model import GigaAM, GigaAMASR, GigaAMEmo, save_model
from gigaam_tpu.types import TranscriptionResult


def tiny_encoder():
    return EncoderConfig(feat_in=64, n_layers=2, d_model=64, n_heads=4,
                         ff_expansion_factor=2, conv_kernel_size=7,
                         pos_emb_max_len=256)


def tiny_ctc_cfg():
    v = len(RU_VOCAB)
    return ModelConfig(
        model_name="tiny_ctc", model_class="asr",
        preprocessor=FeaturesConfig(),
        encoder=tiny_encoder(),
        head=CTCHeadConfig(feat_in=64, num_classes=v + 1),
        decoding=DecodingConfig(kind="ctc_greedy", vocabulary=list(RU_VOCAB)))


def tiny_rnnt_cfg():
    v = len(RU_VOCAB)
    return ModelConfig(
        model_name="tiny_rnnt", model_class="asr",
        preprocessor=FeaturesConfig(),
        encoder=tiny_encoder(),
        head=RNNTHeadConfig(
            decoder=RNNTDecoderConfig(pred_hidden=32, pred_rnn_layers=1,
                                      num_classes=v + 1),
            joint=RNNTJointConfig(enc_hidden=64, pred_hidden=32,
                                  joint_hidden=32, num_classes=v + 1)),
        decoding=DecodingConfig(kind="rnnt_greedy", vocabulary=list(RU_VOCAB)))


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    t = np.arange(16000 * 2) / 16000.0
    wav = (0.3 * np.sin(2 * np.pi * 440 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    path = str(tmp_path_factory.mktemp("audio") / "tone.wav")
    save_wav(path, wav)
    return path


@pytest.fixture(scope="module")
def long_wav_file(tmp_path_factory):
    rng = np.random.default_rng(1)
    sr = 16000
    pieces = []
    for _ in range(4):
        t = np.arange(sr * 8) / sr
        pieces.append(0.3 * np.sin(2 * np.pi * 330 * t).astype(np.float32)
                      + 0.02 * rng.standard_normal(sr * 8).astype(np.float32))
        pieces.append(np.zeros(sr, dtype=np.float32))  # 1 s silence
    wav = np.concatenate(pieces)
    path = str(tmp_path_factory.mktemp("audio") / "long.wav")
    save_wav(path, wav)
    return path


def test_ctc_transcribe(wav_file):
    model = GigaAMASR(tiny_ctc_cfg(), seed=0)
    res = model.transcribe(wav_file)
    assert isinstance(res, TranscriptionResult)
    assert isinstance(res.text, str)
    # determinism
    assert model.transcribe(wav_file).text == res.text


def test_int16_wire_matches_f32(wav_file):
    """The accelerator int16 wire format (host quantize -> device dequant)
    must not change the transcription (audio is 16-bit at the source, so
    the round trip is exact for loaded files)."""
    model = GigaAMASR(tiny_ctc_cfg(), seed=0)
    assert model._int16_wire is False  # opt-in knob, off by default
    ref = model.transcribe(wav_file).text
    model._int16_wire = True
    assert model.transcribe(wav_file).text == ref


def test_ctc_transcribe_with_timestamps(wav_file):
    model = GigaAMASR(tiny_ctc_cfg(), seed=3)
    res = model.transcribe(wav_file, word_timestamps=True)
    assert res.words is not None
    for w in res.words:
        assert 0.0 <= w.start < w.end <= 2.5


def test_rnnt_transcribe(wav_file):
    model = GigaAMASR(tiny_rnnt_cfg(), seed=1)
    res = model.transcribe(wav_file, word_timestamps=True)
    assert isinstance(res.text, str)
    for w in res.words or []:
        assert 0.0 <= w.start < w.end


def test_transcribe_rejects_longform(long_wav_file):
    model = GigaAMASR(tiny_ctc_cfg(), seed=0)
    with pytest.raises(ValueError, match="longform"):
        model.transcribe(long_wav_file)


def test_longform(long_wav_file):
    model = GigaAMASR(tiny_ctc_cfg(), seed=0)
    res = model.transcribe_longform(long_wav_file, word_timestamps=True)
    assert len(res) >= 1
    total = 36.0
    for seg in res:
        assert 0.0 <= seg.start < seg.end <= total + 0.1
        assert 0.2 - 1e-6 <= seg.end - seg.start <= 30.0 + 1e-6
        for w in seg.words or []:
            assert seg.start - 0.1 <= w.start <= w.end <= seg.end + 0.1
    # deterministic across runs (reference ``tests/test_longform.py:182-205``)
    res2 = model.transcribe_longform(long_wav_file)
    assert res2.text == res.text


def test_ssl_embed(wav_file):
    cfg = ModelConfig(model_name="tiny_ssl", model_class="ssl",
                      preprocessor=FeaturesConfig(), encoder=tiny_encoder())
    model = GigaAM(cfg, seed=0)
    encoded, enc_len = model.embed_audio(wav_file)
    assert encoded.shape[0] == 1 and encoded.shape[2] == 64
    assert int(enc_len[0]) <= encoded.shape[1]
    assert np.isfinite(np.asarray(encoded)).all()

    # layout="bdt" returns the reference's [B, D, T'] axis order —
    # drop-in for consumers porting reference code (gigaam/model.py:57-63)
    ref_layout, enc_len2 = model.embed_audio(wav_file, layout="bdt")
    assert ref_layout.shape == (1, 64, encoded.shape[1])
    np.testing.assert_array_equal(np.asarray(ref_layout),
                                  np.asarray(encoded).transpose(0, 2, 1))
    assert int(enc_len2[0]) == int(enc_len[0])
    with pytest.raises(ValueError, match="layout"):
        model.embed_audio(wav_file, layout="tbd")


def test_emo_probs(wav_file):
    cfg = ModelConfig(
        model_name="tiny_emo", model_class="emo",
        preprocessor=FeaturesConfig(), encoder=tiny_encoder(),
        head=EmoHeadConfig(feat_in=64, num_classes=4),
        id2name=["angry", "sad", "neutral", "positive"])
    model = GigaAMEmo(cfg, seed=0)
    probs = model.get_probs(wav_file)
    assert set(probs) == {"angry", "sad", "neutral", "positive"}
    np.testing.assert_allclose(sum(probs.values()), 1.0, atol=1e-5)


def test_save_load_roundtrip(tmp_path, wav_file):
    model = GigaAMASR(tiny_ctc_cfg(), seed=2)
    path = str(tmp_path / "model")
    save_model(model, path)
    loaded = gigaam_tpu.load_model(path)
    assert isinstance(loaded, GigaAMASR)
    assert loaded.transcribe(wav_file).text == model.transcribe(wav_file).text
    # params identical
    a = model.params["head"]["proj"]["w"]
    b = loaded.params["head"]["proj"]["w"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_model_random_init(wav_file):
    model = gigaam_tpu.load_model("v3_ctc", init="random")
    assert isinstance(model, GigaAMASR)
    assert model.cfg.encoder.self_attention_model == "rotary"
    assert model.cfg.preprocessor.center is False  # v3 preprocessing

    with pytest.raises(FileNotFoundError):
        gigaam_tpu.load_model("v2_ctc")
    with pytest.raises(ValueError):
        gigaam_tpu.load_model("not_a_model", init="random")


def test_load_model_random_init_sp_models():
    """SP-tokenizer presets (e2e / v1_rnnt) must work weight-free: the
    vocabulary is synthesized to the head size when no tokenizer exists."""
    import gigaam_tpu

    for name in ("v3_e2e_ctc", "v1_rnnt"):
        model = gigaam_tpu.load_model(name, init="random",
                                      compute_dtype=jnp.float32)
        assert len(model.tokenizer) == model.blank_id
        wav = (0.1 * np.random.default_rng(0)
               .standard_normal(16000)).astype(np.float32)
        text, _ = model._decode_batch([wav], word_timestamps=False)[0]
        assert isinstance(text, str)


def test_save_model_artifact_is_relocatable(tmp_path):
    """save_model must bundle the SP tokenizer and store a relative path,
    so the npz+json pair survives moving to another dir/host even after
    the original download cache is deleted (ADVICE r1)."""
    import shutil

    from gigaam_tpu.config import (CTCHeadConfig, DecodingConfig,
                                   FeaturesConfig, ModelConfig)
    from gigaam_tpu.models.model import load_native
    from test_export_serve import _write_tiny_sp_model

    cache = tmp_path / "cache"
    cache.mkdir()
    sp_path = str(cache / "orig_tok.model")
    pieces = ([("<unk>", 0.0, 2)] + [(c, -1.0, 1) for c in "абвгд"])
    _write_tiny_sp_model(sp_path, pieces)

    v = len(pieces)
    cfg = ModelConfig(
        model_name="tiny_sp", model_class="asr",
        preprocessor=FeaturesConfig(), encoder=tiny_encoder(),
        head=CTCHeadConfig(feat_in=64, num_classes=v + 1),
        decoding=DecodingConfig(kind="ctc_greedy", vocabulary=[],
                                model_path=sp_path))
    model = GigaAMASR(cfg, seed=0, compute_dtype=jnp.float32)
    art_dir = tmp_path / "artifacts"
    save_model(model, str(art_dir / "tiny_sp"))
    # the original cache (and its tokenizer) disappears
    shutil.rmtree(str(cache))
    # the artifact moves to a different directory
    moved = tmp_path / "moved"
    shutil.copytree(str(art_dir), str(moved))
    shutil.rmtree(str(art_dir))

    back = load_native(str(moved / "tiny_sp"))
    assert not back.tokenizer.charwise
    assert back.tokenizer.decode([1, 2]) == "аб"
    # saving a model that was itself loaded from an artifact round-trips
    again = tmp_path / "again"
    save_model(back, str(again / "tiny_sp"))
    assert (again / "tiny_sp_tokenizer.model").is_file()
    assert load_native(str(again / "tiny_sp")).tokenizer.decode([1]) == "а"


def test_save_model_with_cwd_relative_paths(tmp_path, monkeypatch):
    """Relative tokenizer paths and relative artifact paths are resolved
    against the CWD, not the destination dir (code-review r2 finding:
    joining the destination made cross-dir saves crash)."""
    from gigaam_tpu.config import (CTCHeadConfig, DecodingConfig,
                                   FeaturesConfig, ModelConfig)
    from gigaam_tpu.models.model import load_native
    from test_export_serve import _write_tiny_sp_model

    monkeypatch.chdir(tmp_path)
    os.makedirs("cache")
    _write_tiny_sp_model("cache/tok.model",
                         [("<unk>", 0.0, 2)] + [(c, -1.0, 1) for c in "аб"])
    cfg = ModelConfig(
        model_name="tiny_rel", model_class="asr",
        preprocessor=FeaturesConfig(), encoder=tiny_encoder(),
        head=CTCHeadConfig(feat_in=64, num_classes=4),
        decoding=DecodingConfig(kind="ctc_greedy", vocabulary=[],
                                model_path="cache/tok.model"))  # cwd-relative
    model = GigaAMASR(cfg, seed=0, compute_dtype=jnp.float32)
    save_model(model, "a/m")                       # relative destination
    m2 = load_native("a/m")                        # relative artifact path
    assert m2.tokenizer.decode([1]) == "а"
    save_model(m2, "b/m")                          # re-save to another dir
    assert load_native("b/m").tokenizer.decode([2]) == "б"


def test_word_confidences_greedy(wav_file):
    """Greedy CTC and RNNT transcription populates per-word confidence in
    (0, 1]; the result-level aggregate follows (extension over the
    reference, which has no confidence surface)."""
    for cfg_fn, seed in ((tiny_ctc_cfg, 3), (tiny_rnnt_cfg, 1)):
        model = GigaAMASR(cfg_fn(), seed=seed)
        res = model.transcribe(wav_file, word_timestamps=True)
        assert res.words, "random tiny model should emit something"
        for w in res.words:
            assert w.confidence is not None
            assert 0.0 < w.confidence <= 1.0
        assert 0.0 < res.confidence <= 1.0


def test_word_confidences_beam(wav_file):
    """Both beam decoders carry confidences too: the CTC prefix beam from
    host posteriors, the RNNT device beam from its per-hypothesis
    acoustic-logp track."""
    ctc = GigaAMASR(tiny_ctc_cfg(), seed=3)
    res = ctc.transcribe(wav_file, word_timestamps=True, beam_size=4)
    assert res.words
    assert all(w.confidence is not None and 0 < w.confidence <= 1.0
               for w in res.words)

    rnnt = GigaAMASR(tiny_rnnt_cfg(), seed=1)
    res2 = rnnt.transcribe(wav_file, word_timestamps=True, beam_size=4)
    assert res2.words
    assert all(w.confidence is not None and 0 < w.confidence <= 1.0
               for w in res2.words)
