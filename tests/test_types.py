"""Result-type API + JSON wire format (gigaam_tpu/types.py).

Covers the reference result-type surface (``gigaam/types.py:8-68``) plus the
serialization contract the HTTP server/client share.
"""

from gigaam_tpu.types import (
    LongformTranscriptionResult,
    Segment,
    TranscriptionResult,
    Word,
)


def _words():
    return [Word("привет", 0.10, 0.52), Word("мир", 0.61, 0.9004)]


def test_word_properties_and_shift():
    w = Word("да", 1.0, 1.5)
    assert w.duration == 0.5
    s = w.shifted(10.0)
    assert (s.start, s.end, s.text) == (11.0, 11.5, "да")
    # shift rounds to wire precision (ms)
    assert Word("x", 0.00049, 1.0).shifted(0.0).start == 0.0


def test_transcription_result_str_and_dict():
    r = TranscriptionResult(text="привет мир", words=_words())
    assert str(r) == "привет мир"
    d = r.to_dict()
    assert d["text"] == "привет мир"
    assert d["words"][0] == {"word": "привет", "start": 0.1, "end": 0.52}
    assert d["words"][1]["end"] == 0.9  # ms rounding
    # round-trip
    back = TranscriptionResult.from_dict(d)
    assert back.text == r.text
    assert [w.text for w in back.words] == ["привет", "мир"]
    # timestamps forced off omits the key entirely (wire contract)
    assert "words" not in r.to_dict(timestamps=False)
    # no words and no request -> key absent, not null
    assert "words" not in TranscriptionResult(text="a").to_dict()
    # forced on with no words -> empty list
    assert TranscriptionResult(text="a").to_dict(timestamps=True)["words"] == []


def test_segment_and_longform_aggregates():
    segs = [
        Segment(text="раз два", start=0.0, end=2.0, words=[
            Word("раз", 0.1, 0.5), Word("два", 1.0, 1.4)]),
        Segment(text="три", start=5.0, end=6.5, words=[Word("три", 5.2, 5.9)]),
    ]
    res = LongformTranscriptionResult(segments=segs)
    assert res.text == "раз два три"
    assert str(res) == res.text
    assert [w.text for w in res.words] == ["раз", "два", "три"]
    assert res.has_word_timestamps
    assert len(res) == 2
    assert list(res) == segs
    assert res[1].text == "три"
    assert abs(res.duration - 3.5) < 1e-9
    assert abs(segs[0].duration - 2.0) < 1e-9


def test_longform_wire_roundtrip():
    res = LongformTranscriptionResult(segments=[
        Segment(text="раз", start=0.0, end=1.23456,
                words=[Word("раз", 0.1, 0.5)])])
    d = res.to_dict(timestamps=True)
    assert d["text"] == "раз"
    assert d["segments"][0]["end"] == 1.235
    back = LongformTranscriptionResult.from_dict(d)
    assert back.text == "раз"
    assert back.segments[0].words[0].text == "раз"
    # timestamps off strips words from each segment
    d2 = res.to_dict(timestamps=False)
    assert "words" not in d2["segments"][0]


def test_longform_empty():
    res = LongformTranscriptionResult()
    assert res.text == ""
    assert res.words == []
    assert not res.has_word_timestamps
    assert len(res) == 0
    assert LongformTranscriptionResult.from_dict(res.to_dict()).segments == []


def test_word_confidence_wire_roundtrip():
    """confidence: present -> serialized + round-trips; None -> key omitted
    (backward-compatible wire format)."""
    from gigaam_tpu.types import Word

    w = Word("да", 0.1, 0.5, confidence=0.8731)
    d = w.to_dict()
    assert d["confidence"] == 0.8731
    back = Word.from_dict(d)
    assert back.confidence == 0.8731
    assert back.shifted(1.0).confidence == 0.8731

    plain = Word("да", 0.1, 0.5)
    d2 = plain.to_dict()
    assert "confidence" not in d2
    assert Word.from_dict(d2).confidence is None


def test_transcription_result_confidence_property():
    from gigaam_tpu.types import TranscriptionResult, Word

    r = TranscriptionResult("а б", words=[
        Word("а", 0.0, 0.1, confidence=0.9),
        Word("б", 0.2, 0.3, confidence=0.7)])
    assert abs(r.confidence - 0.8) < 1e-9
    assert TranscriptionResult("x").confidence is None
    assert TranscriptionResult(
        "x", words=[Word("x", 0.0, 0.1)]).confidence is None


def test_segment_confidence_property():
    from gigaam_tpu.types import Segment, Word

    s = Segment("а б", 0.0, 1.0, words=[
        Word("а", 0.0, 0.1, confidence=0.6),
        Word("б", 0.2, 0.3, confidence=0.4)])
    assert abs(s.confidence - 0.5) < 1e-9
    assert Segment("x", 0.0, 1.0).confidence is None
