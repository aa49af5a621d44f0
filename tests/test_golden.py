"""Golden-output parity vs the real reference checkpoints.

Every test here needs network-gated artifacts (multi-GB reference ``.ckpt``
files and the CDN example audio) and therefore SKIPS cleanly when they are
absent — the normal offline-CI case.  To actually run the suite:

    python tools/run_parity.py            # download + convert + pytest -m golden

or pre-populate ``GIGAAM_GOLDEN_ROOT`` (default ``~/.cache/gigaam_tpu``) with
the artifacts and run ``pytest tests/test_golden.py -m golden``.  Set
``GIGAAM_GOLDEN=1`` to let the tests download on demand.

Expectations are copied from the reference's own golden tests (they are the
compatibility spec, not code):
- exact transcripts per model        ``tests/test_loading.py:12-54``
- emotion probabilities (atol 1e-3)  ``tests/test_loading.py:13-18,37-44``
- word timestamps (±0.1 s)           ``tests/test_timestamps.py:11-102``
- longform segments + boundaries     ``tests/test_longform.py:17-66,153-179``
  (boundaries need the converted pyannote VAD artifact: the reference always
  segments with pyannote, ``gigaam/vad_utils.py:60-77``)
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.golden

GOLDEN_ROOT = os.environ.get(
    "GIGAAM_GOLDEN_ROOT", os.path.expanduser("~/.cache/gigaam_tpu"))
ALLOW_NET = os.environ.get("GIGAAM_GOLDEN", "0") == "1"
_CDN = "https://cdn.chatwm.opensmodel.sberdevices.ru/GigaAM"

# --- golden expectations (reference tests/test_loading.py:12-22) -----------
ASR_TEXT = (
    "ничьих не требуя похвал счастлив уж я надеждой сладкой что дева с "
    "трепетом любви посмотрит может быть украдкой на песни грешные мои "
    "у лукоморья дуб зеленый")
E2E_TEXT = {
    "v3_e2e_ctc": (
        "Ничьих, не требуя похвал, счастлив уж я надеждой сладкой, Что дева "
        "с трепетом любви посмотрит, может быть украдкой На песни грешные "
        "мои. У лукоморья дуб зелёный."),
    "v3_e2e_rnnt": (
        "Ничьих не требуя похвал, Счастлив уж я надеждой сладкой, Что дева "
        "с трепетом любви Посмотрит, может быть, украдкой На песни грешные "
        "мои. У лукоморья дуб зелёный."),
}
EMO_PROBS = {
    "angry": 7.70451661082916e-05,
    "sad": 0.002205904107540846,
    "neutral": 0.9233596324920654,
    "positive": 0.07435736805200577,
}

# reference tests/test_timestamps.py:11-77 (word, start, end)
WORDS_V3_CTC = [
    ("ничьих", 0.08, 0.44), ("не", 0.52, 0.64), ("требуя", 0.72, 1.0),
    ("похвал", 1.16, 1.52), ("счастлив", 1.76, 2.2), ("уж", 2.28, 2.4),
    ("я", 2.48, 2.52), ("надеждой", 2.72, 3.12), ("сладкой", 3.2, 3.6),
    ("что", 3.68, 3.8), ("дева", 3.92, 4.12), ("с", 4.2, 4.24),
    ("трепетом", 4.32, 4.72), ("любви", 4.84, 5.12),
    ("посмотрит", 5.4, 5.92), ("может", 6.04, 6.24), ("быть", 6.32, 6.48),
    ("украдкой", 6.6, 7.08), ("на", 7.16, 7.24), ("песни", 7.36, 7.64),
    ("грешные", 7.72, 8.12), ("мои", 8.28, 8.48), ("у", 9.28, 9.32),
    ("лукоморья", 9.44, 10.04), ("дуб", 10.16, 10.36),
    ("зеленый", 10.48, 10.92),
]
WORDS_V3_E2E_RNNT = [
    ("Ничьих", 0.04, 0.4), ("не", 0.52, 0.56), ("требуя", 0.64, 0.96),
    ("похвал,", 1.08, 1.6), ("Счастлив", 1.72, 2.16), ("уж", 2.24, 2.4),
    ("я", 2.48, 2.52), ("надеждой", 2.64, 3.12), ("сладкой,", 3.16, 3.68),
    ("Что", 3.72, 3.76), ("дева", 3.88, 4.08), ("с", 4.16, 4.2),
    ("трепетом", 4.24, 4.72), ("любви", 4.8, 5.04),
    ("Посмотрит,", 5.32, 6.0), ("может", 6.08, 6.12), ("быть,", 6.28, 6.48),
    ("украдкой", 6.52, 6.96), ("На", 7.16, 7.2), ("песни", 7.28, 7.56),
    ("грешные", 7.68, 8.08), ("мои.", 8.24, 8.72), ("У", 9.2, 9.24),
    ("лукоморья", 9.36, 10.0), ("дуб", 10.12, 10.36),
    ("зелёный.", 10.48, 11.08),
]

# reference tests/test_longform.py:17-66 — (text, start, end) per segment
LONGFORM = {
    "v3_ctc": [
        ("вечерня отошла давно но в кельях тихо и темно уже и сам игумен "
         "строгий свои молитвы прекратил и кости ветхие склонил "
         "перекрестясь на одр убогий кругом и сон и тишина но церкви дверь "
         "отворена", 0.03096875, 16.80471875),
        ("трепещет луч лампады и тускло озаряет он и темную живопись икон "
         "и позлащенные оклады и раздается в тишине то тяжкий вздох то "
         "шепот важный и мрачно дремлет в вашине старинный свод",
         17.074718750000002, 32.549093750000004),
        ("глухой и влажный стоят за клиросом чернец и грешник неподвижны "
         "оба и шепот их как глаз из гроба и грешник бледен как мертвец "
         "монах несчастный полно перестань", 32.95409375,
         49.305968750000005),
        ("ужасна исповедь злодея заплачена тобою дань тому кто в злобе "
         "пламенея лукаво грешника блюдет и к вечной гибели ведет смирись "
         "опомнись время время раскаянье покров", 49.81221875,
         65.65784375),
        ("я разрешу тебя грехов сложи мучительное бремя", 65.94471875,
         70.88909375),
    ],
    "v3_e2e_rnnt": [
        ("Вечерня отошла давно, Но в кельях тихо и темно; Уже и сам игумен "
         "строгий Свои молитвы прекратил И кости ветхие склонил, "
         "Перекрестясь на одр убогий. Кругом и сон, и тишина; Но церкви "
         "дверь отворена.", 0.03096875, 16.80471875),
        ("Трепещет луч лампады, И тускло озаряет он И тёмную живопись "
         "икон, и возглащённые оклады. И раздаётся в тишине То тяжкий "
         "вздох, то шёпот важный, И мрачно дремлет в тишине старинный "
         "свод.", 17.074718750000002, 32.549093750000004),
        ("Глухой и влажный Стоят за клиросом чернец и грешник, Неподвижны "
         "оба. И шёпот их — Как глаз из гроба, И грешник бледен, как "
         "мертвец — Монах. Несчастный! Полно, перестань!", 32.95409375,
         49.305968750000005),
        ("Ужасна исповедь злодея, Заплачена тобою дань Тому, Кто в злобе "
         "пламенея Лукавого грешника блюдёт И к вечной гибели ведёт. "
         "Смирись, опомнись. Время, время. Раскаянье, покров",
         49.81221875, 65.65784375),
        ("Я разрешу тебя, грехов сложи мучительное бремя.", 65.94471875,
         70.88909375),
    ],
}


# --- gated artifact helpers -------------------------------------------------

def _audio(name: str) -> str:
    path = os.path.join(GOLDEN_ROOT, name)
    if os.path.isfile(path):
        return path
    if not ALLOW_NET:
        pytest.skip(f"{name} not in {GOLDEN_ROOT} "
                    f"(run tools/run_parity.py, or set GIGAAM_GOLDEN=1)")
    import gigaam_tpu

    try:
        return gigaam_tpu._download_file(f"{_CDN}/{name}", path)
    except Exception as e:
        pytest.skip(f"could not download {name}: {e}")


def _model(name: str):
    import gigaam_tpu

    converted = os.path.join(GOLDEN_ROOT, f"{name}.npz")
    ckpt = os.path.join(GOLDEN_ROOT, f"{name}.ckpt")
    if not (ALLOW_NET or os.path.isfile(converted) or os.path.isfile(ckpt)):
        pytest.skip(f"weights for {name} not in {GOLDEN_ROOT} "
                    f"(run tools/run_parity.py, or set GIGAAM_GOLDEN=1)")
    try:
        return gigaam_tpu.load_model(name, download_root=GOLDEN_ROOT)
    except FileNotFoundError as e:
        pytest.skip(f"weights for {name} unavailable: {e}")
    except Exception as e:  # torch missing for .ckpt conversion, etc.
        pytest.skip(f"could not load {name}: {e}")


def _require_neural_vad(monkeypatch) -> None:
    art = os.path.join(GOLDEN_ROOT, "vad_segmentation.npz")
    if not os.path.isfile(art):
        pytest.skip(
            "converted pyannote VAD artifact missing; longform boundaries "
            "are only reference-comparable with the neural VAD — convert "
            "with tools/convert_vad.py (see tools/run_parity.py --vad)")
    from gigaam_tpu import vad

    monkeypatch.setenv("GIGAAM_VAD_ARTIFACT", art)
    monkeypatch.setattr(vad, "_NEURAL_VAD", None)


# --- tests -------------------------------------------------------------------

CHAR_ASR = ["v1_ctc", "v1_rnnt", "v2_ctc", "v2_rnnt", "v3_ctc", "v3_rnnt"]


@pytest.mark.parametrize("name", CHAR_ASR)
def test_golden_transcripts_charwise(name):
    model = _model(name)
    result = model.transcribe(_audio("example.wav"))
    assert str(result) == ASR_TEXT


@pytest.mark.parametrize("name", ["v3_e2e_ctc", "v3_e2e_rnnt"])
def test_golden_transcripts_e2e(name):
    model = _model(name)
    result = model.transcribe(_audio("example.wav"))
    assert str(result) == E2E_TEXT[name]


@pytest.mark.parametrize("name", ["v3_ctc", "v3_rnnt"])
def test_golden_beam_and_lm_preserve_transcript(name):
    """On clear audio with trained weights, beam search must agree with
    greedy (the golden transcript), and shallow fusion with an in-domain
    LM (trained on the transcript itself) must not perturb it."""
    from gigaam_tpu.decode.lm import train_lm_from_texts

    model = _model(name)
    wav = _audio("example.wav")
    assert str(model.transcribe(wav, beam_size=8)) == ASR_TEXT
    lm = train_lm_from_texts([ASR_TEXT], model.tokenizer, order=3)
    fused = model.transcribe(wav, beam_size=8, lm=lm, lm_weight=0.3)
    assert str(fused) == ASR_TEXT


def test_golden_emo_probs():
    model = _model("emo")
    probs = model.get_probs(_audio("example.wav"))
    for emotion, expected in EMO_PROBS.items():
        assert abs(probs[emotion] - expected) < 1e-3, (emotion, probs)


@pytest.mark.parametrize("name", ["v1_ssl", "v2_ssl", "v3_ssl"])
def test_golden_ssl_embeddings(name):
    model = _model(name)
    emb, lengths = model.embed_audio(_audio("example.wav"))
    emb = np.asarray(emb)
    assert emb.ndim == 3 and emb.shape[-1] == 768
    assert np.isfinite(emb).all()


@pytest.mark.parametrize("name,golden", [
    ("v3_ctc", WORDS_V3_CTC), ("v3_e2e_rnnt", WORDS_V3_E2E_RNNT)])
def test_golden_word_timestamps(name, golden):
    model = _model(name)
    result = model.transcribe(_audio("example.wav"), word_timestamps=True)
    assert len(result.words) == len(golden), \
        [w.text for w in result.words]
    for actual, (word, start, end) in zip(result.words, golden):
        assert actual.text == word
        assert abs(actual.start - start) < 0.1, (word, actual.start, start)
        assert abs(actual.end - end) < 0.1, (word, actual.end, end)


@pytest.mark.parametrize("name", ["v3_ctc", "v3_e2e_rnnt"])
def test_golden_longform(name, monkeypatch):
    _require_neural_vad(monkeypatch)
    model = _model(name)
    result = model.transcribe_longform(_audio("long_example.wav"))
    golden = LONGFORM[name]
    assert len(result.segments) == len(golden), \
        [(s.start, s.end) for s in result.segments]
    for seg, (text, start, end) in zip(result.segments, golden):
        assert abs(seg.start - start) < 0.1 and abs(seg.end - end) < 0.1, \
            (seg.start, seg.end, start, end)
        assert seg.text == text
