"""Gated parity: pure-Python SentencePiece vs the real sentencepiece library.

The repo reimplements SP model parsing + unigram Viterbi encoding in pure
Python (``gigaam_tpu/decode/tokenizer.py``; reference wraps the C++ library
at ``gigaam/decoding.py:10-44``).  Self-consistency is covered in
``test_decoding.py``; THIS file pins exactness against the real library —
``encode`` (the Viterbi segmentation itself, not just decode), ``decode``,
and ``id_to_piece`` — and is skipped when ``sentencepiece`` is not
installed (it is not in the offline image; ``tools/run_parity.py`` runs it
in connected environments, where it additionally round-trips the released
``v3_e2e`` tokenizer if cached).

The in-test model is *trained* by the real library on a Russian corpus, so
the scores are realistic (ties are measure-zero) and byte-fallback pieces
are present, exercising the OOV path end to end.
"""

from __future__ import annotations

import os

import pytest

sp = pytest.importorskip("sentencepiece")

from gigaam_tpu.decode.tokenizer import SentencePieceModel  # noqa: E402

# normalized single-spaced lowercase text — the exact distribution the
# tokenizer sees from AudioDataset.normalize_text fine-tuning targets
CORPUS = [
    "привет как дела",
    "сегодня хорошая погода в москве",
    "машинное обучение на тензорных процессорах",
    "он сказал что придет завтра утром",
    "распознавание речи работает все лучше",
    "это тестовое предложение для токенизатора",
    "двадцать пять градусов тепла",
    "я не знаю что ответить на этот вопрос",
    "модель обучается на большом корпусе текстов",
    "конференция начнется в десять часов",
] * 20

# eval texts: in-domain, OOV latin/digits/symbols (byte-fallback path),
# rare chars, single words, boundary spaces already normalized away
EVAL_TEXTS = [
    "привет как дела",
    "сегодня плохая погода",
    "обучение моделей",
    "привет",
    "а",
    "xyz latin text",
    "смесь russian и английского",
    "числа 12345 и знаки",
    "ёжик в тумане",
    "очень длинное слово электроэнцефалографический",
    "текст с эмодзи \U0001F600 внутри",
]


@pytest.fixture(scope="module")
def sp_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("sp")
    corpus = os.path.join(d, "corpus.txt")
    with open(corpus, "w") as f:
        f.write("\n".join(CORPUS))
    prefix = os.path.join(d, "m")
    sp.SentencePieceTrainer.train(
        input=corpus, model_prefix=prefix, vocab_size=180,
        model_type="unigram", byte_fallback=True,
        character_coverage=0.9995)
    return prefix + ".model"


@pytest.fixture(scope="module")
def real(sp_model):
    proc = sp.SentencePieceProcessor()
    proc.Load(sp_model)
    return proc


@pytest.fixture(scope="module")
def ours(sp_model):
    return SentencePieceModel(sp_model)


def test_vocab_parity(real, ours):
    assert len(ours) == real.GetPieceSize()
    for i in range(len(ours)):
        assert ours.id_to_piece(i) == real.IdToPiece(i), i


def test_encode_viterbi_parity(real, ours):
    for text in EVAL_TEXTS + CORPUS[:10]:
        assert ours.encode(text) == real.EncodeAsIds(text), text


def test_decode_parity(real, ours):
    for text in EVAL_TEXTS + CORPUS[:10]:
        ids = real.EncodeAsIds(text)
        assert ours.decode(ids) == real.DecodeIds(ids), text


def test_decode_parity_arbitrary_id_sequences(real, ours):
    """Decode must agree on sequences the model did NOT produce (beam/LM
    fusion can emit any id order), including lone byte pieces."""
    import random

    rng = random.Random(0)
    n = real.GetPieceSize()
    for _ in range(50):
        ids = [rng.randrange(n) for _ in range(rng.randrange(1, 20))]
        assert ours.decode(ids) == real.DecodeIds(ids), ids


def test_released_tokenizer_roundtrip_if_cached(real, ours):
    """Connected runs: the released v3_e2e tokenizer (once downloaded by
    ``load_model``) must also encode/decode identically."""
    root = os.path.expanduser("~/.cache/gigaam_tpu")
    candidates = [
        os.path.join(root, f)
        for f in (os.listdir(root) if os.path.isdir(root) else [])
        if f.endswith("_tokenizer.model")
    ]
    if not candidates:
        pytest.skip("no released tokenizer cached (offline)")
    for path in candidates:
        proc = sp.SentencePieceProcessor()
        proc.Load(path)
        mine = SentencePieceModel(path)
        assert len(mine) == proc.GetPieceSize()
        for text in EVAL_TEXTS + CORPUS[:10]:
            got = mine.encode(text)
            assert got == proc.EncodeAsIds(text), (path, text)
            assert mine.decode(got) == proc.DecodeIds(got), (path, text)
