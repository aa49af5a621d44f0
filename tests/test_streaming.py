"""Streaming ASR tests: LocalAgreement commits, stability, trim behavior,
and short-stream equality with offline transcribe (an extension over the
reference, which has no streaming at all)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gigaam_tpu.audio import save_wav
from gigaam_tpu.models.model import GigaAMASR
from gigaam_tpu.streaming import StreamingTranscriber, stream_file

from test_training import tiny_cfg

SR = 16000


@pytest.fixture(scope="module")
def ctc_model():
    return GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)


def _speechy(seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    return (0.3 * np.sin(2 * np.pi * 280 * t)
            + 0.08 * rng.standard_normal(t.size)).astype(np.float32)


def test_short_stream_matches_offline(ctc_model, tmp_path):
    """Committed text after flush == offline transcribe (no trims for
    streams shorter than the window; the flush decodes the whole buffer)."""
    wav = _speechy(6.0, seed=1)
    path = str(tmp_path / "s.wav")
    save_wav(path, wav)
    offline = ctc_model.transcribe(path).text

    st = StreamingTranscriber(ctc_model, window_s=20.0, stride_s=2.0,
                              trim_s=12.0)
    # 16-bit quantized input (as the wav file stores it) so both paths see
    # identical samples
    q = np.clip(np.rint(wav * 32767.0), -32768, 32767) / 32768.0
    q = q.astype(np.float32)
    for i in range(0, len(q), SR // 2):
        st.push(q[i: i + SR // 2])
    st.flush()
    assert st.text == offline


def test_committed_text_is_stable(ctc_model):
    """Committed words are never retracted or reordered as audio grows."""
    wav = _speechy(10.0, seed=2)
    st = StreamingTranscriber(ctc_model, window_s=20.0, stride_s=1.0)
    snapshots = []
    for i in range(0, len(wav), SR // 2):
        st.push(wav[i: i + SR // 2])
        snapshots.append(st.text)
    st.flush()
    snapshots.append(st.text)
    for a, b in zip(snapshots, snapshots[1:]):
        assert b.startswith(a), (a, b)
    # times are monotonically non-decreasing
    times = [(w.start, w.end) for w in st.committed]
    assert times == sorted(times)
    for w in st.committed:
        assert w.start < w.end


def test_long_stream_trims_buffer(ctc_model):
    """A stream longer than trim_s keeps the rolling buffer bounded."""
    wav = _speechy(30.0, seed=3)
    st = StreamingTranscriber(ctc_model, window_s=16.0, stride_s=2.0,
                              trim_s=8.0)
    for i in range(0, len(wav), SR):
        st.push(wav[i: i + SR])
        assert len(st._buf) <= st.window
    st.flush()
    assert st.text  # something was transcribed
    assert st._base > 0, "expected at least one buffer trim on 30 s audio"


def test_stream_file_events(ctc_model):
    """stream_file yields partial + committed events and one final flush."""
    wav = _speechy(8.0, seed=4)
    events = list(stream_file(ctc_model, wav, chunk_s=0.5,
                              window_s=20.0, stride_s=2.0))
    kinds = [e.kind for e in events]
    assert kinds[-1] == "committed"  # the flush
    assert "partial" in kinds
    d = events[-1].to_dict()
    assert set(d) == {"kind", "text", "words"}


def test_localagreement_zero_word_loss_oracle(ctc_model):
    """Zero word loss AND zero duplication on a seeded 60 s stream, pinned
    against the policy itself (round-3 verdict #5).

    The transcriber is driven through its pluggable ``decode_fn`` by an
    oracle: each buffer decode returns exactly the ground-truth words fully
    inside the buffer, with any word near the unstable right edge mangled
    (as a real model's half-heard word would be).  LocalAgreement-2 +
    midpoint dedup + trims must still reproduce the truth exactly — a
    dropped word (trim boundary bug), a doubled word (dedup bug), or a
    mangled commit (edge holdback bug) all fail this test."""
    from gigaam_tpu.types import Word

    truth = [Word(f"w{k}", 2.0 * k + 0.3, 2.0 * k + 1.5)
             for k in range(29)]  # last word ends at 57.5 < 60 - margin
    total_s = 60.0

    st = StreamingTranscriber(
        ctc_model, window_s=20.0, stride_s=2.0, trim_s=12.0,
        right_margin_s=1.0,
        decode_fn=lambda buf: _oracle_decode(st, buf, truth))

    def _oracle_decode(stx, buf, words):
        lo = stx._base / SR
        hi = lo + len(buf) / SR
        out = []
        for w in words:
            if w.start >= lo and w.end <= hi:
                rel = Word(w.text, w.start - lo, w.end - lo)
                if hi - w.end < 0.8 and hi < total_s:
                    # unstable right edge: the word is still being heard
                    rel = Word(w.text[:1] + "?", rel.start, rel.end)
                out.append(rel)
        return out

    rng = np.random.default_rng(0)
    pos = 0
    n_total = int(total_s * SR)
    while pos < n_total:
        step = int(rng.uniform(0.3, 0.9) * SR)  # ragged chunk sizes
        st.push(np.zeros(min(step, n_total - pos), np.float32))
        pos += step
    st.flush()

    got = st.text.split()
    want = [w.text for w in truth]
    assert got == want, (f"policy lost/duplicated words:\n"
                         f"want {want}\ngot  {got}")
    # committed times match the truth exactly (no drift through trims)
    for a, b in zip(st.committed, truth):
        assert abs(a.start - b.start) < 1e-6 and abs(a.end - b.end) < 1e-6
    assert st._base > 0, "stream this long must have trimmed"


def test_push_after_flush_raises(ctc_model):
    st = StreamingTranscriber(ctc_model)
    st.push(np.zeros(SR, np.float32))
    st.flush()
    with pytest.raises(AssertionError):
        st.push(np.zeros(100, np.float32))


def test_streaming_rnnt_model():
    """Streaming works for RNNT heads too (frames come from the on-device
    greedy loop); short-stream flush equals offline decode."""
    model = GigaAMASR(tiny_cfg("rnnt"), seed=0, compute_dtype=jnp.float32)
    wav = _speechy(5.0, seed=5)
    st = StreamingTranscriber(model, window_s=20.0, stride_s=2.0)
    for i in range(0, len(wav), SR // 2):
        st.push(wav[i: i + SR // 2])
    st.flush()
    offline = model._decode_batch([wav], word_timestamps=False)[0][0]
    assert st.text == offline
